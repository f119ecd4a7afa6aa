"""Bench the stem-fused chain kernel (block_chain3_stem) against the current
production path (XLA stem + 1x1 residual conv, then block_chain3) and the full
XLA composition, at the SRDiff down-stage-0 hot shape (reference
srdiff/model.py:774-781,826-832 — the 3->64 stem at 512² runs at ~2 TFLOP/s
standalone and its output + r1 round-trip HBM between the XLA region and the
chain call; the stem variant keeps both inside VMEM).

Env: BR=block_rows (default 4), COND=1 (default), B/H/W/C for the shape.
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
    block_chain3_stem,
    block_chain3_stem_reference,
)
from dgm_img_super_resolution_tpu.models.layers import reflect_conv3x3

BR = int(os.environ.get("BR", "4"))
COND = bool(int(os.environ.get("COND", "1")))
B = int(os.environ.get("B", "8"))
H = int(os.environ.get("H", "512"))
W = int(os.environ.get("W", "512"))
C = int(os.environ.get("C", "64"))

rng = np.random.default_rng(0)
dt = jnp.bfloat16

def t(*shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape) * scale, dt)

x = t(B, H, W, 3)
wa = t(3, 3, 3, C, scale=0.2)
ba = t(C, scale=0.1)
wr = t(3, C, scale=0.2)
br = t(C, scale=0.1)
tv1, tv2 = t(B, C), t(B, C)
wb, wc_, wd = (t(3, 3, C, C, scale=0.08) for _ in range(3))
bb, bc_, bd = (t(C, scale=0.1) for _ in range(3))
cond = t(B, H, W, C) if COND else None

CONSTS = (wa, ba, wr, br, tv1, tv2, wb, bb, wc_, bc_, wd, bd) + (
    (cond,) if COND else ()
)

def _split(cs):
    return cs[:12], (cs[12] if COND else None)

# time_op scans the function with the input as carry, so each variant is
# closed to a shape-preserving loop by feeding 3 output channels back in
# (one cheap slice per iteration, identical across variants).

def run_stem_kernel(x, *cs):
    ws, cnd = _split(cs)
    return block_chain3_stem(x, *ws, cnd, BR, False)[..., :3]

def run_prod(x, *cs):
    """Current production path: XLA stem + r1, then the chain kernel."""
    (wa, ba, wr, br, tv1, tv2, wb, bb, wc_, bc_, wd, bd), cnd = _split(cs)
    a_pre = reflect_conv3x3(x, wa, ba, dtype=dt)
    r1 = jnp.einsum("bhwc,cd->bhwd", x, wr.astype(dt)) + br.astype(dt)
    return block_chain3(
        a_pre, r1, tv1, tv2, wb, bb, wc_, bc_, wd, bd, cnd, BR, False
    )[..., :3]

def run_ref(x, *cs):
    ws, cnd = _split(cs)
    return block_chain3_stem_reference(x, *ws, cnd)[..., :3]

# numeric sanity on real Mosaic (bf16 tolerance: kernel keeps f32 accum,
# reference rounds per-op — expect ~1e-2 max deltas, not equality)
@functools.partial(jax.jit)
def _err(x, *cs):
    ws, cnd = _split(cs)
    a = block_chain3_stem(x, *ws, cnd, BR, False).astype(jnp.float32)
    b = block_chain3_stem_reference(x, *ws, cnd).astype(jnp.float32)
    return jnp.mean(jnp.abs(a - b)), jnp.max(jnp.abs(a - b))

me, mx = (float(v) for v in _err(x, *CONSTS))
print(f"BR={BR} COND={COND} B={B} H={H} W={W} C={C}  mean|err|={me:.4f} max|err|={mx:.4f}", flush=True)

gflop = (3 * 2 * B * H * W * 9 * C * C + 2 * B * H * W * (9 + 1) * 3 * C) / 1e9
ds = time_op(run_stem_kernel, x, iters=10, consts=CONSTS)
dp = time_op(run_prod, x, iters=10, consts=CONSTS)
dr = time_op(run_ref, x, iters=10, consts=CONSTS)
print(f"stem-fused kernel : {ds*1e3:.2f} ms  {gflop/ds/1e3:.1f} TFLOP/s (useful)", flush=True)
print(f"XLA stem + chain  : {dp*1e3:.2f} ms  {gflop/dp/1e3:.1f} TFLOP/s (useful)", flush=True)
print(f"full XLA          : {dr*1e3:.2f} ms  {gflop/dr/1e3:.1f} TFLOP/s (useful)", flush=True)
print(f"speedup vs prod: {dp/ds:.3f}x   vs XLA: {dr/ds:.3f}x", flush=True)
