"""A/B the Upsample ConvTranspose(k=4,s=2,p=1) formulations on real TPU.

The UNet's three Upsamples are ~22 GFLOP/img of the sampler step and run as
``conv_general_dilated`` with ``lhs_dilation=2`` (models/layers.py
ConvTranspose2dTorch) — a formulation XLA may lower poorly (the dilated
input zero-fills 3 of every 4 positions, wasting MXU K-dim occupancy).
Candidates, all mathematically exact rewrites:

a) ``dilated``  — the current lhs_dilation form.
b) ``phase4``   — sub-pixel decomposition: 4 VALID 2×2 convs (one per output
                  parity phase, kernel slices) + interleave (depth-to-space).
                  Exact FLOPs (4·C² MAC/outpx), 4 small convs.
c) ``embed3x3`` — ONE VALID 3×3 conv with C→4C channels where each phase's
                  2×2 kernel is zero-embedded at its (a,b) offset, then
                  depth-to-space. 2.25× the FLOPs but one perfectly
                  MXU-shaped conv and one fused reshuffle.

Env: B/H/W/C set the INPUT shape (output is 2H×2W). Run per stage:
  C=64 H=256 (up_2 → the 512² output), C=128 H=128 (up_1), C=192 H=64 (up_0).
"""
import sys, os, functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import time_op

B = int(os.environ.get("B", "8"))
H = int(os.environ.get("H", "256"))
W = int(os.environ.get("W", str(H)))
C = int(os.environ.get("C", "64"))
dt = jnp.bfloat16
dn = ("NHWC", "HWIO", "NHWC")

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.5, dt)
k = jnp.asarray(rng.standard_normal((4, 4, C, C)) * 0.05, dt)  # stored pre-flipped
bias = jnp.asarray(rng.standard_normal((C,)) * 0.1, dt)


def dilated(x, k, bias):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2), dimension_numbers=dn
    )
    return y + bias


def _interleave(y00, y01, y10, y11):
    b, h, w, c = y00.shape
    y = jnp.stack([jnp.stack([y00, y01], 3), jnp.stack([y10, y11], 3)], 3)
    # (B,H,W,2,2,C) with axes (row-parity a, col-parity b)
    y = y.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, c)


def phase4(x, k, bias):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1), padding="VALID",
        dimension_numbers=dn,
    )
    h, w = x.shape[1], x.shape[2]
    # phase (a, b): input rows j-1+a..j+a, cols l-1+b..l+b; kernel rows
    # (k[0],k[2]) for a=0 / (k[1],k[3]) for a=1, same for cols
    ys = {}
    for a in (0, 1):
        for b_ in (0, 1):
            sl = xp[:, a : a + h + 1, b_ : b_ + w + 1, :]
            kk = k[a::2][:2][:, b_::2][:, :2]  # (2,2,C,C): rows {a,a+2}, cols {b,b+2}
            ys[(a, b_)] = conv(sl, kk)
    return _interleave(*(ys[p] for p in ((0, 0), (0, 1), (1, 0), (1, 1)))) + bias


def embed3x3(x, k, bias):
    c = x.shape[-1]
    k3 = jnp.zeros((3, 3, c, 4 * c), dt)
    for a in (0, 1):
        for b_ in (0, 1):
            g = a * 2 + b_
            kk = k[a::2][:2][:, b_::2][:, :2]  # (2,2,C,C)
            k3 = k3.at[a : a + 2, b_ : b_ + 2, :, g * c : (g + 1) * c].set(kk)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(xp, k3, (1, 1), "VALID", dimension_numbers=dn)
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)
    return y + bias


fns = {"dilated": dilated, "phase4": phase4, "embed3x3": embed3x3}
want = np.asarray(jax.jit(dilated)(x, k, bias), np.float32)
flops = B * (2 * H) * (2 * W) * 4 * C * C * 2
for name, fn in fns.items():
    got = np.asarray(jax.jit(fn)(x, k, bias), np.float32)
    err = np.abs(got - want).max()
    # shape-preserving chain for time_op: upsample then stride-2 subsample
    # (same small additive cost for every variant — comparison unaffected)
    def step(h, kk, bb, fn=fn):
        return fn(h, kk, bb)[:, ::2, ::2, :]

    ms = time_op(step, x, consts=(k, bias)) * 1e3
    eff = flops / (ms * 1e-3) / 1e12
    print(f"{name:9s}: {ms:7.3f} ms  {eff:6.1f} TFLOP/s(true)  max|err|={err:.4f}",
          flush=True)
