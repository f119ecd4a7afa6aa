"""Determine axon-tunnel execution semantics: are dispatched programs executed
eagerly (queued on device) or lazily (only when a result is fetched)?

Probe: dispatch N independent heavy matmul programs, fetch ONE result.
- eager queue: fetch waits for all N (time ~ N*t).
- lazy: only the fetched program runs (time ~ t).
Also: does block_until_ready actually wait?
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np

n = 8192
a = jax.device_put(np.random.rand(n, n).astype(np.float32)).astype(jnp.bfloat16)
f = jax.jit(lambda x, s: (x + s) @ x.T)
_ = float(jnp.sum(f(a, 0.0).astype(jnp.float32)))  # compile
t_one = []
for i in range(3):
    t0 = time.perf_counter()
    v = float(jnp.sum(f(a, float(i + 1)).astype(jnp.float32)))
    t_one.append(time.perf_counter() - t0)
print(f"single call+fetch: {np.median(t_one)*1e3:.1f} ms")

N = 10
t0 = time.perf_counter()
outs = [f(a, float(i + 100)) for i in range(N)]
t_disp = time.perf_counter() - t0
v = float(jnp.sum(outs[0].astype(jnp.float32)))
t_first = time.perf_counter() - t0
jax.block_until_ready(outs)
t_bur = time.perf_counter() - t0
vals = [float(jnp.sum(o.astype(jnp.float32))) for o in outs]
t_all = time.perf_counter() - t0
print(f"dispatch {N}: {t_disp*1e3:.1f} ms; fetch first: {t_first*1e3:.1f} ms; "
      f"block_until_ready all: {t_bur*1e3:.1f} ms; fetch all: {t_all*1e3:.1f} ms")
