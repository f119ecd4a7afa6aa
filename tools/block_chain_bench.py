"""Bench the fused ResnetBlock-pair chain kernel vs the XLA reference
composition. Default shape is the 512²/C=64 hot region (reference
srdiff/model.py:774-781); W/C env vars rebench any UNet stage — e.g.
C=128 H=256 W=256 is down stage 1, C=192 H=128 W=128 is down stage 2,
and W=500 H=500 probes the native-size (non-lane-aligned) serving shapes.

Env: BR=block_rows (default 4), COND=1 to include the RRDB-condition add,
B/H/W/C for the shape.
"""
import functools
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import time_op
from dgm_img_super_resolution_tpu.ops.pallas.block_chain import (
    block_chain3,
    block_chain3_reference,
)

BR = int(os.environ.get("BR", "4"))
COND = bool(int(os.environ.get("COND", "1")))
B = int(os.environ.get("B", "8"))
H = int(os.environ.get("H", "512"))
W = int(os.environ.get("W", "512"))
C = int(os.environ.get("C", "64"))

rng = np.random.default_rng(0)
b, hh, w, c = B, H, W, C
dt = jnp.bfloat16

def t(*shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape) * scale, dt)

a_pre = t(b, hh, w, c)
r1 = t(b, hh, w, c)
tv1 = t(b, c)
tv2 = t(b, c)
wb, wc_, wd = (t(3, 3, c, c, scale=0.08) for _ in range(3))
bb, bc_, bd = (t(c, scale=0.1) for _ in range(3))
cond = t(b, hh, w, c) if COND else None

# NB: arrays must be jit *arguments* — closing over them embeds them as HLO
# constants and the tunnel's remote_compile endpoint rejects the >100MB body
# with HTTP 413.
@functools.partial(jax.jit, static_argnames=("br",))
def _err(a_pre, r1, tv1, tv2, wb, bb, wc_, bc_, wd, bd, cond, br):
    want = block_chain3_reference(
        a_pre, r1, tv1, tv2, wb, bb, wc_, bc_, wd, bd, cond
    ).astype(jnp.float32)
    got = block_chain3(
        a_pre, r1, tv1, tv2, wb, bb, wc_, bc_, wd, bd, cond, br, False
    ).astype(jnp.float32)
    e = jnp.abs(got - want)
    return jnp.mean(e), jnp.max(e)

me, mx = (float(v) for v in _err(a_pre, r1, tv1, tv2, wb, bb, wc_, bc_, wd, bd, cond, BR))
print(f"BR={BR} COND={COND} mean|err|={me:.4f} max|err|={mx:.4f}", flush=True)

gflop = 3 * 2 * b * hh * w * 9 * c * c / 1e9

CONSTS = (r1, tv1, tv2, wb, bb, wc_, bc_, wd, bd) + ((cond,) if COND else ())

def run_kernel(x, *cs):
    cnd = cs[9] if COND else None
    return block_chain3(x, *cs[:9], cnd, BR, False)

def run_ref(x, *cs):
    cnd = cs[9] if COND else None
    return block_chain3_reference(x, *cs[:9], cnd)

dk = time_op(run_kernel, a_pre, iters=10, consts=CONSTS)
dr = time_op(run_ref, a_pre, iters=10, consts=CONSTS)
print(f"fused BR={BR}: {dk*1e3:.2f} ms  {gflop/dk/1e3:.1f} TFLOP/s (useful)", flush=True)
print(f"XLA ref     : {dr*1e3:.2f} ms  {gflop/dr/1e3:.1f} TFLOP/s (useful)", flush=True)
print(f"speedup: {dr/dk:.3f}x", flush=True)
