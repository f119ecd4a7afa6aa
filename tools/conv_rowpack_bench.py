"""Bench the row-pair-packed Pallas conv vs XLA at the 512²/C=64 hot shape."""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import time_op
from dgm_img_super_resolution_tpu.ops.pallas.conv3x3 import conv3x3_rowpack

BR = int(os.environ.get("BR", "16"))
MISH = bool(int(os.environ.get("MISH", "0")))

rng = np.random.default_rng(0)
b, hh, w, c = 8, 512, 512, 64
x = jnp.asarray(rng.standard_normal((b, hh, w, c)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.bfloat16)

ref = jax.lax.conv_general_dilated(
    x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
) + bias.astype(jnp.float32)
if MISH:
    ref = ref * jnp.tanh(jax.nn.softplus(ref))
out = conv3x3_rowpack(x, k, bias, mish=MISH, block_rows=BR)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
print(f"BR={BR} MISH={MISH} max abs err vs XLA: {err:.4f}", flush=True)

gflop = 2 * b * hh * w * 9 * c * c / 1e9
dt = time_op(lambda t: conv3x3_rowpack(t, k, bias, mish=MISH, block_rows=BR), x, iters=10)
print(f"rowpack BR={BR} mish={MISH}: {dt*1e3:.2f} ms {gflop/dt/1e3:.1f} TFLOP/s (useful)", flush=True)
