import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.models.factory import build_srdiff, init_srdiff_params
from dgm_img_super_resolution_tpu.ops.resize import resize

T = 10
hp = Hparams(compute_dtype="bfloat16", timesteps=T)
diff = build_srdiff(hp)
params = init_srdiff_params(diff, jax.random.PRNGKey(0), hp, hr_size=64)
B, LR = 8, 128
x_lr = jnp.asarray(np.random.rand(B, LR, LR, 3).astype(np.float32) * 2 - 1)
up = resize(x_lr, (LR*4, LR*4), variant="torch")

def timeit(name, f, *a):
    v = float(f(*a)); ts = []
    for i in range(4):
        t0 = time.perf_counter(); v = float(f(*a)); ts.append(time.perf_counter()-t0)
    print(f"{name}: median {np.median(ts)*1e3:.0f} ms")

@jax.jit
def full(params, img_lr, img_lr_up, r):
    img, _ = diff.sample(params, img_lr, img_lr_up, r)
    return jnp.sum(img.astype(jnp.float32))
timeit("full sampler T=10", full, params, x_lr, up, jax.random.PRNGKey(0))

# variant: no per-step randomness (noise=0), rest identical
def p_mean_only_scan(params, img_lr, img_lr_up, r):
    rrdb_out, cond = diff.rrdb_cond(params, img_lr, img_lr_up)
    cond = diff._project_cond(params, cond, img_lr_up)
    x = jax.random.normal(r, img_lr_up.shape, jnp.float32)
    def step(x, ti):
        t = jnp.full((B,), ti, jnp.int32)
        np_ = diff._apply_denoise(params, x, t, cond, img_lr_up, True).astype(jnp.float32)
        mean, _, logv, x0 = diff.p_mean_variance(x, t, np_, True)
        return mean, None
    x, _ = jax.lax.scan(step, x, jnp.arange(T-1, -1, -1))
    return jnp.sum(diff.res2img(x, img_lr_up).astype(jnp.float32))
timeit("no-noise scan  T=10", jax.jit(p_mean_only_scan), params, x_lr, up, jax.random.PRNGKey(0))

# variant: unet only in scan (bf16 carry)
def unet_only(params, img_lr, img_lr_up, r):
    rrdb_out, cond = diff.rrdb_cond(params, img_lr, img_lr_up)
    cond = diff._project_cond(params, cond, img_lr_up)
    x = jax.random.normal(r, img_lr_up.shape, jnp.bfloat16)
    def step(x, ti):
        t = jnp.full((B,), ti, jnp.int32)
        np_ = diff._apply_denoise(params, x, t, cond, img_lr_up, True)
        return np_, None
    x, _ = jax.lax.scan(step, x, jnp.arange(T-1, -1, -1))
    return jnp.sum(x.astype(jnp.float32))
timeit("unet-only scan T=10", jax.jit(unet_only), params, x_lr, up, jax.random.PRNGKey(0))
