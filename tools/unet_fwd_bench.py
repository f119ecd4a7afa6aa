import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from dgm_img_super_resolution_tpu.models.unet import Unet

B, HR, LR = 8, 512, 128
dt = jnp.bfloat16
unet = Unet(dim=64, dim_mults=(1,2,3,4), cond_dim=32, rrdb_num_block=8, sr_scale=4, dtype=dt)
rng = jax.random.PRNGKey(0)
kx, kc = jax.random.split(rng)
x = jax.random.normal(kx, (B, HR, HR, 3), dt)
tt = jnp.full((B,), 50, jnp.int32)
cond = jax.random.normal(kc, (B, LR, LR, 32*3), dt)
params = unet.init(jax.random.PRNGKey(1), x, tt, cond)

fwd = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c))
y = jax.block_until_ready(fwd(params, x, tt, cond))
print("out", y.shape, y.dtype)
# per-iteration blocking
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    y = jax.block_until_ready(fwd(params, x, tt, cond))
    ts.append(time.perf_counter() - t0)
ts = np.array(ts)
gflop = 338 * B
print(f"per-iter blocked: median {np.median(ts)*1e3:.2f} ms  ~{gflop/np.median(ts)/1e3:.1f} TFLOP/s  min {ts.min()*1e3:.2f}")
# pipelined
t0 = time.perf_counter()
outs = [fwd(params, x, tt, cond) for _ in range(20)]
jax.block_until_ready(outs)
dt_s = (time.perf_counter() - t0) / 20
print(f"pipelined(block all): {dt_s*1e3:.2f} ms  ~{gflop/dt_s/1e3:.1f} TFLOP/s")

# axon tunnel: block_until_ready may not truly sync — force host fetch of a scalar
s = jax.jit(lambda p, x, t, c: jnp.sum(unet.apply(p, x, t, c).astype(jnp.float32)))
v = float(s(params, x, tt, cond))
ts = []
for _ in range(8):
    t0 = time.perf_counter()
    v = float(s(params, x, tt, cond))
    ts.append(time.perf_counter() - t0)
ts = np.array(ts)
gflop = 338 * B
print(f"host-fetch sync: median {np.median(ts)*1e3:.2f} ms  ~{gflop/np.median(ts)/1e3:.1f} TFLOP/s  all {np.round(ts*1e3,1)}")
