import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
from dgm_img_super_resolution_tpu.models.unet import Unet

B, HR, LR, T = 8, 512, 128, 20
dt = jnp.bfloat16
unet = Unet(dim=64, dim_mults=(1,2,3,4), cond_dim=32, rrdb_num_block=8, sr_scale=4, dtype=dt)
kx, kc = jax.random.split(jax.random.PRNGKey(0))
x = jax.random.normal(kx, (B, HR, HR, 3), dt)
cond = jax.random.normal(kc, (B, LR, LR, 32*3), dt)
params = unet.init(jax.random.PRNGKey(1), x, jnp.zeros((B,), jnp.int32), cond)
cond_hr = unet.apply(params, x, jnp.zeros((B,), jnp.int32), cond, project_only=True)

@jax.jit
def chain(p, x, c):
    def step(h, t):
        h = unet.apply(p, h, jnp.full((B,), t, jnp.int32), c, cond_projected=True)
        return h * 0.999, None
    h, _ = jax.lax.scan(step, x, jnp.arange(T))
    return jnp.sum(h.astype(jnp.float32))

v = float(chain(params, x, cond_hr))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    v = float(chain(params, x, cond_hr))
    ts.append(time.perf_counter() - t0)
per_step = np.median(ts) / T
gflop = 338 * B
print(f"scan per-step: {per_step*1e3:.2f} ms  ~{gflop/per_step/1e3:.1f} TFLOP/s  (whole-chain medians ms: {np.round(np.array(ts)*1e3,0)})")
