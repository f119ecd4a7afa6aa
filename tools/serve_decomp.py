"""Decompose the op-point serving program (ddim20/eta=1, batch 8, 128->512):
prep (resize + RRDB cond + projection), the ddim scan, and the epilogue
(res2img + clip + uint8). Each piece is its own jitted program timed by the
scalar-fetch methodology (docs/DESIGN.md "Measurement methodology"); the
whole-program number is the same serve path bench.py measures.

Env: B (default 8), STEPS (20), ETA (1.0).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.inference import SRDiffPipeline
from dgm_img_super_resolution_tpu.ops.resize import resize

B = int(os.environ.get("B", "8"))
STEPS = int(os.environ.get("STEPS", "20"))
ETA = float(os.environ.get("ETA", "1.0"))
LR = 128

hp = Hparams(compute_dtype="bfloat16", sampler="ddim", sample_timesteps=STEPS, ddim_eta=ETA)
pipe = SRDiffPipeline(hp)
d = pipe.diffusion
params = pipe.params
x_lr = jnp.asarray(np.random.default_rng(0).random((B, LR, LR, 3), np.float32) * 2 - 1)
rng = jax.random.PRNGKey(0)


def timeit(name, f, *a, iters=5):
    f(*a)  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*a))
        ts.append(time.perf_counter() - t0)
    m = float(np.median(ts)) * 1e3
    print(f"{name:28s} {m:8.1f} ms")
    return m


@jax.jit
def serve(params, img_lr, r):
    img_lr_up = resize(img_lr, (LR * 4, LR * 4), variant="torch")
    img, _ = d.ddim_sample(params, img_lr, img_lr_up, r, num_steps=STEPS, eta=ETA)
    out = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
    out = jnp.round(out * 255.0).astype(jnp.uint8)
    return jnp.sum(out.astype(jnp.float32))


@jax.jit
def prep(params, img_lr, r):
    img_lr_up = resize(img_lr, (LR * 4, LR * 4), variant="torch")
    x, cond, _, _ = d.sample_prepare(params, img_lr, img_lr_up, r)
    return jnp.sum(x) + jnp.sum(cond.astype(jnp.float32))


@jax.jit
def prep_scan(params, img_lr, r):
    img_lr_up = resize(img_lr, (LR * 4, LR * 4), variant="torch")
    ts, ts_prev = d.ddim_timesteps(STEPS)
    x, cond, _, rng_steps = d.sample_prepare(params, img_lr, img_lr_up, r)
    x = d.ddim_segment(params, x, cond, img_lr_up, ts, ts_prev, rng_steps, ETA)
    return jnp.sum(x)


t_serve = timeit("serve (full program)", serve, params, x_lr, rng)
t_prep = timeit("prep (resize+rrdb+proj)", prep, params, x_lr, rng)
t_ps = timeit("prep + ddim scan", prep_scan, params, x_lr, rng)
print(f"{'-> scan per step':28s} {(t_ps - t_prep) / STEPS:8.2f} ms")
print(f"{'-> epilogue (serve - ps)':28s} {t_serve - t_ps:8.1f} ms")
