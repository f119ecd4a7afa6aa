import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
y = jax.device_put(np.random.rand(8,512,512,3).astype(np.float32))
s = float(jnp.sum(y))  # sync
for _ in range(3):
    t0 = time.perf_counter(); _ = np.asarray(y); print(f"D2H 25MB: {time.perf_counter()-t0:.2f}s")
x = np.random.randint(0,255,(8,128,128,3),np.uint8)
for _ in range(3):
    t0 = time.perf_counter(); d = jax.device_put(x); _ = float(jnp.sum(d)); print(f"H2D 0.4MB+sync: {time.perf_counter()-t0:.3f}s")
