"""TPU conv-strategy microbenchmark for the SRDiff UNet hot convs.

Measures, on the real chip:
1. device kind + bf16 matmul peak (roofline anchor);
2. achieved TFLOP/s of each distinct (H, W, Cin, Cout) 3x3 conv shape in the
   SRDiff UNet at 512x512, via plain XLA conv;
3. alternative formulations of the same conv (pixel-packed matmul, 9-shift
   matmul accumulation) to decide whether a custom path beats XLA's emitter.

Run: python tools/perf_microbench.py   (requires the axon TPU tunnel)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, *args, iters=20, warmup=2):
    for _ in range(warmup):
        r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv_shift9(x, w):
    """y = sum_{dy,dx} shift(x) @ w[dy,dx] — 9 matmuls of (BHW,Cin)@(Cin,Cout)."""
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((b, h, wd, cout), x.dtype)
    for dy in range(3):
        for dx in range(3):
            y = y + jnp.einsum(
                "bhwc,cd->bhwd", jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, wd, cin)), w[dy, dx]
            )
    return y


def pack2_weights(w):
    """(3,3,Cin,Cout) kernel → (4*3*Cin, 2*Cout) block-shifted matrix:
    W2[(dx', dy, ci), (j, co)] = w[dy, dx'-j, ci, co] (zero outside)."""
    cin, cout = w.shape[2], w.shape[3]
    w2 = jnp.zeros((4, 3, cin, 2, cout), w.dtype)
    for j in range(2):
        for dx in range(3):
            w2 = w2.at[j + dx, :, :, j, :].add(w[:, dx])
    return w2.reshape(12 * cin, 2 * cout)


def conv_pack2(x, w):
    """2-pixel lane packing: two horizontally-adjacent output pixels share one
    matmul row block, so the output minor dim is 2*Cout=128 — full MXU lanes
    when Cout=64 (vs 50% underfill for a plain conv). 75% of the padded
    contraction is useful work."""
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (b, h+2, w+2, cin)
    # rows: 3 vertically shifted views, channel-stacked -> (b, h, w+2, 3*cin)
    rows = jnp.concatenate([xp[:, dy : dy + h] for dy in range(3)], axis=-1)
    # cols: 4 horizontally shifted views at stride 2 -> (b, h, w/2, 4, 3*cin)
    win = jnp.stack([rows[:, :, dx : dx + wd : 2] for dx in range(4)], axis=3)
    win = win.reshape(b, h, wd // 2, 12 * cin)
    y = win @ pack2_weights(w)
    return y.reshape(b, h, wd, cout)


def main():
    d = jax.devices()[0]
    print(f"device: {d} kind={d.device_kind}")

    # --- matmul peak anchor
    for n in (4096, 8192):
        x = jnp.ones((n, n), jnp.bfloat16)
        f = jax.jit(lambda a, b: a @ b)
        dt = timed(f, x, x)
        print(f"bf16 matmul {n}: {2 * n**3 / dt / 1e12:.1f} TFLOP/s")

    # --- SRDiff UNet conv shapes at 512x512 (batch 8)
    shapes = [
        (8, 512, 512, 64, 64),
        (8, 256, 256, 128, 128),
        (8, 128, 128, 192, 192),
        (8, 64, 64, 256, 256),
        (8, 512, 512, 128, 64),  # up-stage concat conv
    ]
    rng = np.random.default_rng(0)
    for (b, h, wd, cin, cout) in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, wd, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        gflop = 2 * b * h * wd * cin * cout * 9 / 1e9
        variants = {"xla_conv": conv_xla, "shift9": conv_shift9}
        if cout <= 64:
            variants["pack2"] = conv_pack2
        # correctness cross-check in f32 on small slice
        ref = None
        for name, fn in variants.items():
            jf = jax.jit(fn)
            try:
                dt = timed(jf, x, w)
            except Exception as e:  # noqa: BLE001
                print(f"  {name}: FAILED {type(e).__name__}: {e}")
                continue
            out = np.asarray(jf(x, w), np.float32)
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-6))
            print(
                f"  ({b},{h},{wd},{cin}->{cout}) {name}: {dt*1e3:.2f} ms "
                f"{gflop/dt/1e3:.1f} TFLOP/s relerr={err:.2e}"
            )


if __name__ == "__main__":
    main()
