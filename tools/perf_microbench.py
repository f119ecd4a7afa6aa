"""TPU conv-strategy microbenchmark for the SRDiff UNet hot convs.

Measures, on the real chip (with scan-chained timing — see tpu_timing.py for
why naive block_until_ready timing is invalid on the axon tunnel):

1. device kind + bf16 matmul peak (roofline anchor);
2. achieved TFLOP/s of each distinct square (H, W, C) 3x3 conv shape in the
   SRDiff UNet at 512x512, via plain XLA conv;
3. alternative formulations of the same conv: materialised reflect-pad,
   border-corrected reflect (the production path), 2-pixel lane packing;
4. batch scaling (8 vs 16) for the widest conv.

Run: python tools/perf_microbench.py   (requires the axon TPU tunnel)
"""

from __future__ import annotations

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import time_op, time_fn
from dgm_img_super_resolution_tpu.models.layers import reflect_conv3x3, reflect_pad


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv_reflect_mat(x, w):
    return jax.lax.conv_general_dilated(
        reflect_pad(x, 1), w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def pack2_weights(w):
    """(3,3,Cin,Cout) kernel -> (4*3*Cin, 2*Cout) block-shifted matrix."""
    cin, cout = w.shape[2], w.shape[3]
    w2 = jnp.zeros((4, 3, cin, 2, cout), w.dtype)
    for j in range(2):
        for dx in range(3):
            w2 = w2.at[j + dx, :, :, j, :].add(w[:, dx])
    return w2.reshape(12 * cin, 2 * cout)


def conv_pack2(x, w2, cout):
    b, h, wd, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = jnp.concatenate([xp[:, dy : dy + h] for dy in range(3)], axis=-1)
    win = jnp.stack([rows[:, :, dx : dx + wd : 2] for dx in range(4)], axis=3)
    win = win.reshape(b, h, wd // 2, 12 * cin)
    y = win @ w2
    return y.reshape(b, h, wd, cout)


def main():
    d = jax.devices()[0]
    print(f"device: {d} kind={d.device_kind}")
    rng = np.random.default_rng(0)

    # --- matmul peak anchor (square, chained)
    for n in (4096, 8192):
        x = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
        dt = time_op(lambda a: (a @ a).astype(jnp.bfloat16), x, iters=10)
        print(f"bf16 matmul {n}: {2 * n**3 / dt / 1e12:.1f} TFLOP/s  ({dt*1e3:.2f} ms)")

    # --- SRDiff UNet square conv shapes (batch 8)
    shapes = [
        (8, 512, 512, 64),
        (8, 256, 256, 128),
        (8, 128, 128, 192),
        (8, 64, 64, 256),
        (16, 512, 512, 64),
    ]
    for (b, h, wd, c) in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, wd, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
        w2 = pack2_weights(w)
        bias = jnp.zeros((c,), jnp.bfloat16)
        gflop = 2 * b * h * wd * c * c * 9 / 1e9
        variants = {
            "xla_zero_pad": lambda t: conv_xla(t, w),
            "reflect_materialised": lambda t: conv_reflect_mat(t, w),
            "reflect_corrected": lambda t: reflect_conv3x3(t, w, bias, dtype=jnp.bfloat16),
            "pack2": lambda t: conv_pack2(t, w2, c),
        }
        for name, fn in variants.items():
            try:
                dt = time_op(fn, x, iters=10)
            except Exception as e:  # noqa: BLE001
                print(f"  ({b},{h}x{wd},{c}) {name}: FAILED {type(e).__name__}")
                continue
            print(f"  ({b},{h}x{wd},{c}) {name}: {dt*1e3:.2f} ms {gflop/dt/1e3:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
