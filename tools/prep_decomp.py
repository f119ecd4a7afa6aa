"""Decompose `sample_prepare` at the op point (batch 8, 128→512): bicubic
resize, RRDB condition encoder, cond projection (transposed conv + folded
up_proj), and the initial noise draw. Whole-program scalar-fetch timings;
differences between cumulative programs isolate each stage.

CAVEAT (measured, round 3): the tunnel imposes a ~27-31 ms floor per
dispatched program round-trip that varies run to run, so ABSOLUTE numbers
here are floor-dominated — only the differences between cumulative programs
mean anything, and only when they exceed a few ms. Round-3 reading:
resize ≈ sub-ms in-program (see tools/resize_bench.py), RRDB ≈ 31 ms,
projection + init noise ≈ 0. The whole prep is ≤ ~30 ms of the 920 ms
op-point serve — not worth kernel work while the scan is 94% of the time.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.inference import SRDiffPipeline
from dgm_img_super_resolution_tpu.ops.resize import resize

B, LR = 8, 128
hp = Hparams(compute_dtype="bfloat16")
pipe = SRDiffPipeline(hp)
d = pipe.diffusion
params = pipe.params
x_lr = jnp.asarray(np.random.default_rng(0).random((B, LR, LR, 3), np.float32) * 2 - 1)
rng = jax.random.PRNGKey(0)


def timeit(name, f, *a, reps=7):
    jf = jax.jit(f)
    float(jnp.sum(jf(*a).astype(jnp.float32)))
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(jf(*a).astype(jnp.float32)))
        out.append(time.perf_counter() - t0)
    m = float(np.median(out)) * 1e3
    print(f"{name:36s} {m:8.1f} ms")
    return m


t0 = timeit("resize only", lambda x: resize(x, (LR * 4, LR * 4), variant="torch"), x_lr)


def rrdb_only(x):
    up = resize(x, (LR * 4, LR * 4), variant="torch")
    _, cond = d.rrdb_cond(params, x, up)
    return cond.astype(jnp.float32)

t1 = timeit("+ rrdb cond", rrdb_only, x_lr)


def proj(x):
    up = resize(x, (LR * 4, LR * 4), variant="torch")
    _, cond = d.rrdb_cond(params, x, up)
    return d._project_cond(params, cond, up).astype(jnp.float32)

t2 = timeit("+ cond projection", proj, x_lr)


def full(x, r):
    up = resize(x, (LR * 4, LR * 4), variant="torch")
    xx, cond, _, _ = d.sample_prepare(params, x, up, r)
    return xx + jnp.sum(cond.astype(jnp.float32)) * 0

t3 = timeit("+ init noise (full prep)", full, x_lr, rng)

print()
print(f"{'resize':24s} {t0:7.1f} ms")
print(f"{'rrdb':24s} {t1 - t0:7.1f} ms")
print(f"{'projection':24s} {t2 - t1:7.1f} ms")
print(f"{'init noise/rest':24s} {t3 - t2:7.1f} ms")
