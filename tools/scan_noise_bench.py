"""Where do the ~2 ms/step of non-UNet scan time go at the op point
(ddim20/eta=1, batch 8, 512x512)?  A/B the full ddim scan per-step time:

  a) eta=1, threefry f32 noise (current production path)
  b) eta=0 with the draw skipped at trace time (floor: update math only)
  c) eta=1, rbg generator (partitionable, bulk-friendly on TPU)
  d) eta=1, threefry drawn in bf16 (halve the draw's HBM write)

Each variant times the REAL `ddim_segment` scan (5 steps, same UNet) via the
whole-program scalar-fetch methodology; the UNet cost cancels in differences.

RESULT (round 3, real TPU): the draw costs 0.21 ms/step (threefry f32);
rbg is no faster (0.30) and a bf16 draw saves only 0.04 ms/step. The
sampler keeps the plain threefry f32 draw — every alternative was a
complexity or numerics change for <0.5% of the step. (An earlier 2.4
ms/step estimate came from a constant-folded microbench — the key was
loop-invariant, so XLA hoisted the draw; this bench threads the real
fold_in(key, t) dependence.)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.inference import SRDiffPipeline

B, LR, STEPS = 8, 128, 5
hp = Hparams(compute_dtype="bfloat16", sampler="ddim", sample_timesteps=20, ddim_eta=1.0)
pipe = SRDiffPipeline(hp)
d = pipe.diffusion
params = pipe.params
x_lr = jnp.asarray(np.random.default_rng(0).random((B, LR, LR, 3), np.float32) * 2 - 1)
from dgm_img_super_resolution_tpu.ops.resize import resize
x_up = resize(x_lr, (LR * 4, LR * 4), variant="torch")
rng = jax.random.PRNGKey(0)
x0, cond, _, rng_steps = jax.jit(d.sample_prepare)(params, x_lr, x_up, rng)
x0, cond = jax.block_until_ready(x0), jax.block_until_ready(cond)
ts_all, tsp_all = d.ddim_timesteps(20)
ts, tsp = ts_all[:STEPS], tsp_all[:STEPS]


def timeit(name, f, *a, reps=5):
    jf = jax.jit(f)
    float(jnp.sum(jf(*a)))  # compile
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(jf(*a)))
        out.append(time.perf_counter() - t0)
    m = float(np.median(out)) * 1e3
    print(f"{name:34s} {m:8.1f} ms total  {m/STEPS:6.2f} ms/step")
    return m


def make_segment(noise_fn):
    """ddim_segment with a pluggable per-step noise draw."""
    def seg(params, x, cond, ts, tsp, key):
        b = x.shape[0]
        def step(x, t_pair):
            ti, tp = t_pair
            t = jnp.full((b,), ti, jnp.int32)
            eps = d._apply_denoise(params, x, t, cond, x_up, True).astype(jnp.float32)
            acp = d.schedule.alphas_cumprod
            a_t = acp[ti]
            a_prev = jnp.where(tp >= 0, acp[jnp.maximum(tp, 0)], 1.0)
            xr = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            xr = jnp.clip(xr, -1.0, 1.0)
            eps2 = (x - jnp.sqrt(a_t) * xr) / jnp.sqrt(1.0 - a_t)
            sigma = jnp.sqrt((1.0 - a_prev) / (1.0 - a_t)) * jnp.sqrt(1.0 - a_t / a_prev)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps2
            upd = jnp.sqrt(a_prev) * xr + dir_xt
            n = noise_fn(key, ti, x)
            if n is not None:
                upd = upd + sigma * n
            return upd, None
        x, _ = jax.lax.scan(step, x, (ts, tsp))
        return x
    return seg


key_tf = jax.random.PRNGKey(1)
key_rbg = jax.random.key(1, impl="rbg")

t_eta1 = timeit("eta=1 threefry f32 (prod)", make_segment(
    lambda k, ti, x: jax.random.normal(jax.random.fold_in(k, ti), x.shape, x.dtype)),
    params, x0, cond, ts, tsp, key_tf)
t_eta0 = timeit("eta=0 (no draw; floor)", make_segment(
    lambda k, ti, x: None), params, x0, cond, ts, tsp, key_tf)
t_rbg = timeit("eta=1 rbg f32", make_segment(
    lambda k, ti, x: jax.random.normal(jax.random.fold_in(k, ti), x.shape, x.dtype)),
    params, x0, cond, ts, tsp, key_rbg)
t_bf16 = timeit("eta=1 threefry bf16", make_segment(
    lambda k, ti, x: jax.random.normal(jax.random.fold_in(k, ti), x.shape, jnp.bfloat16).astype(x.dtype)),
    params, x0, cond, ts, tsp, key_tf)

print()
print(f"noise draw cost (threefry f32): {(t_eta1-t_eta0)/STEPS:6.2f} ms/step")
print(f"noise draw cost (rbg f32):      {(t_rbg-t_eta0)/STEPS:6.2f} ms/step")
print(f"noise draw cost (threefry b16): {(t_bf16-t_eta0)/STEPS:6.2f} ms/step")
