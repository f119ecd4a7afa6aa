"""Fused UNet tail Pallas kernel: Upsample(ConvT k4/s2/p1) → final Block
(reflect conv3x3 + Mish) → final 1×1 conv, in ONE call.

Motivation (round-5 xprof attribution of the op-point step, real v5e,
tools/profile_scan.py): the tail region after the up-2 chain kernel was
~5.9 ms of the 40 ms step and mostly layout/HBM-hobbled, not compute-bound —

    up_2_upsample ConvTranspose   1.47 ms  (HBM-bound, 213 GiB/s)
    final_block conv              2.14 ms  (72 TF/s in a {3,0,2,1} layout)
    final_block Mish loop fusion  1.64 ms  (HBM-bound, 306 GiB/s)
    final_conv 1×1 + convert      0.71 ms  (writes f32 {2,3,1,0:T(4,128)})

i.e. XLA materialises the (B,512,512,64) upsampled tensor and the conv
output to HBM at awkward layouts between every op. This kernel keeps both
512²×64 intermediates entirely in VMEM: net HBM traffic is read x
(B,H,W,64 at the pre-upsample resolution) + write ε (B,2H,W,2·C_out) — an
~8× reduction for the region. The same lag-pipelined sequential row-block
grid as ``block_chain.py``.

Phase-separated columns: the ConvTranspose's column interleave (out col
2m+b) is a strided scatter Mosaic can't express densely, so the upsampled
rows live as two per-phase buffers (b=0 even cols, b=1 odd cols) and the
3×3 conv is evaluated in phase space (out col phase p reads tap phases
(1−p, p, 1−p) at col offsets). The OUTPUT is written as (B, 2H, W, 2·C_out)
with the last dim ordered [phase0 channels | phase1 channels]: since
(m, b, c) flattens col-major-contiguously, ``out.reshape(B, 2H, 2W, C_out)``
is the exact interleaved image as a free (bitcast-level) reshape.

Row bookkeeping (4 input rows per grid step → 8 output rows): with the
pre-flipped HWIO kernel, ConvT output row o = 2i+a reads input rows
i−1+a..i+a (zero-padded outside), so input block j (rows 4j..4j+3) plus a
1-row top halo completes the 8-row band [8j−1 .. 8j+6] — offset −1 from
the written block, which is exactly the top halo the 3×3 conv needs. Grid
step j: stage U assembles x block j and computes band j; stage F computes
output block j−1 (rows 8(j−1)..8(j−1)+7) from band j−1 plus the first two
rows of band j (borrowed into the band-(j−1) slot). Reflect rows at the
image top/bottom and the odd last row (which reads a zero x row H) are
``pl.when`` edge cases.

All matmuls are dense, full-K packs (no structural zeros, no rowpack
redundancy): ConvT rows are (W,128)@(128,64) dots with the two dx taps
K-concatenated; the 3×3 conv is, per (phase, dy), one (W,128)@(128,64)
dot (first two dx taps packed) plus one (W,64)@(64,64) dot.

Reference citations: the reference's tail is ``srdiff/model.py:798-800``
(Upsample) + ``model.py:801-805`` (final Block + 1×1) executed per sampler
step in its Python loop (``model.py:1076-1086``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS_IN = 4  # input rows per grid step → 8 output rows


def _mish_f32(x):
    x = x.astype(jnp.float32)
    return x * jnp.tanh(jax.nn.softplus(x))


def _kernel(
    x_ref, kt_ref, bt_ref, wf2_ref, wf1_ref, bf_ref, wo_ref, bo_ref, o_ref,
    x_s, ph0_s, ph1_s,
    *, width: int, c: int, cout: int, out_dtype,
):
    """Grid (B, nb+1). width = pre-upsample W; c = 64; cout = final lanes
    per phase (4 for the lane-padded carry)."""
    nsteps = pl.num_programs(1)
    nb = nsteps - 1
    j = pl.program_id(1)
    rows = _ROWS_IN

    x_cur = jax.lax.rem(j, 2)
    x_prev = 1 - x_cur
    ph_cur = x_cur
    ph_prev = x_prev
    phases = (ph0_s, ph1_s)

    # ---- stage U: assemble x block j, compute ups band j (active j < nb).
    @pl.when(j < nb)
    def _stage_u():
        # x scratch rows 1..rows = block rows 4j..4j+3; cols 1..W = content,
        # cols 0 / W+1 = ConvT zero padding; row 0 = top halo (x row 4j−1).
        x_s[x_cur, 1 : rows + 1, 1 : width + 1, :] = x_ref[0]
        x_s[x_cur, :, 0, :] = jnp.zeros((rows + 1, c), x_s.dtype)
        x_s[x_cur, :, width + 1, :] = jnp.zeros((rows + 1, c), x_s.dtype)

        @pl.when(j > 0)
        def _():
            x_s[x_cur, 0, :, :] = x_s[x_prev, rows, :, :]

        @pl.when(j == 0)
        def _():
            # ConvT pads with ZEROS above the image (row −1).
            x_s[x_cur, 0, :, :] = jnp.zeros((width + 2, c), x_s.dtype)

        bt = bt_ref[0].astype(jnp.float32)
        # band k = out row 8j−1+k; pair P = k//2 reads x scratch rows P, P+1.
        # k even → odd out row (a=1): kernel rows ky=1 (lower), 3 (upper);
        # k odd → even out row (a=0): ky=0 (lower), 2 (upper). The K-pack
        # concatenates the TWO ROWS (same column offset — Mosaic requires
        # concat operands to share their non-concat-dim offsets; packing
        # the two dx taps would mix col offsets b and b+1).
        for P in range(rows):
            for half in range(2):  # half=0 → k=2P (a=1); half=1 → k=2P+1 (a=0)
                k = 2 * P + half
                for b in range(2):
                    acc = jnp.zeros((width, c), jnp.float32)
                    for dx in range(2):
                        lhs = jnp.concatenate(
                            [
                                x_s[x_cur, P, b + dx : b + dx + width, :],
                                x_s[x_cur, P + 1, b + dx : b + dx + width, :],
                            ],
                            axis=-1,
                        )
                        acc = acc + jnp.dot(
                            lhs, kt_ref[4 * half + 2 * b + dx],
                            preferred_element_type=jnp.float32,
                        )
                    # phase scratch: band content rows 0..7, cols 1..W.
                    phases[b][ph_cur, k, 1 : width + 1, :] = (acc + bt).astype(
                        ph0_s.dtype
                    )

        # Column reflect halos of the 512² image: ups col −1 ≡ ups col 1
        # (phase1 m=0 → phase1 low halo = its col-1 content); ups col 2W ≡
        # ups col 2W−2 (phase0 high halo = its col-W content). The other two
        # halo columns are never read.
        ph1_s[ph_cur, 0:rows * 2, 0, :] = ph1_s[ph_cur, 0:rows * 2, 1, :]
        ph0_s[ph_cur, 0:rows * 2, width + 1, :] = ph0_s[ph_cur, 0:rows * 2, width, :]

        @pl.when(j == 0)
        def _():
            # image top: out row −1 (band row 0) ≡ out row 1 (band row 2).
            for ph in phases:
                ph[ph_cur, 0, :, :] = ph[ph_cur, 2, :, :]

        @pl.when(j > 0)
        def _():
            # borrow band j's first two rows (out rows 8j−1, 8j) into the
            # band j−1 slot as its rows 8, 9 — stage F then reads a
            # contiguous 10-row window.
            for ph in phases:
                ph[ph_prev, rows * 2, :, :] = ph[ph_cur, 0, :, :]
                ph[ph_prev, rows * 2 + 1, :, :] = ph[ph_cur, 1, :, :]

        @pl.when(j == nb - 1)
        def _():
            # last band: out row 2H−1 (odd, a=1, i=H−1) reads x rows H−1 and
            # H — the latter is the zero pad, so only the ky=1 (lower-row)
            # half of each packed rhs applies: plain (W,C)@(C,C) dots.
            bt_ = bt_ref[0].astype(jnp.float32)
            for b in range(2):
                acc = jnp.zeros((width, c), jnp.float32)
                for dx in range(2):
                    acc = acc + jnp.dot(
                        x_s[x_cur, rows, b + dx : b + dx + width, :],
                        kt_ref[2 * b + dx, :c],  # half=0 pack, lower row = ky 1
                        preferred_element_type=jnp.float32,
                    )
                phases[b][ph_cur, rows * 2, 1 : width + 1, :] = (acc + bt_).astype(
                    ph0_s.dtype
                )
            ph1_s[ph_cur, rows * 2, 0, :] = ph1_s[ph_cur, rows * 2, 1, :]
            ph0_s[ph_cur, rows * 2, width + 1, :] = ph0_s[ph_cur, rows * 2, width, :]
            # image bottom: out row 2H (band row 9) ≡ out row 2H−2 (row 7).
            for ph in phases:
                ph[ph_cur, rows * 2 + 1, :, :] = ph[ph_cur, rows * 2 - 1, :, :]

    # ---- stage F: 3×3 reflect conv + Mish + 1×1 for out block j−1
    # (active j ≥ 1). Out row r reads band rows r, r+1, r+2.
    @pl.when(j >= 1)
    def _stage_f():
        bfv = bf_ref[0].astype(jnp.float32)
        bov = bo_ref[0].astype(jnp.float32)
        s = 1 - jax.lax.rem(j, 2)  # slot (j−1) % 2
        # Tap pairing chosen so every lane-concat's operands share the same
        # column offset (a Mosaic requirement): both phases K-pack
        # (ph0[m], ph1[m]) — scratch col offset 1 in both buffers — and the
        # remaining tap is a plain single dot.
        #   p=0: wf[dy,0]·ph1[m−1] + [wf[dy,1]·ph0[m] + wf[dy,2]·ph1[m]]
        #   p=1: [wf[dy,0]·ph0[m] + wf[dy,1]·ph1[m]] + wf[dy,2]·ph0[m+1]
        for r in range(2 * rows):
            outs = []
            for p in range(2):
                acc = jnp.zeros((width, c), jnp.float32)
                for dy in range(3):
                    row = r + dy
                    lhs2 = jnp.concatenate(
                        [
                            ph0_s[s, row, 1 : width + 1, :],
                            ph1_s[s, row, 1 : width + 1, :],
                        ],
                        axis=-1,
                    )
                    if p == 0:
                        lhs1 = ph1_s[s, row, 0:width, :]
                        w2, w1 = wf2_ref[3 + dy], wf1_ref[dy]
                    else:
                        lhs1 = ph0_s[s, row, 2 : width + 2, :]
                        w2, w1 = wf2_ref[dy], wf1_ref[3 + dy]
                    acc = acc + jnp.dot(
                        lhs2, w2, preferred_element_type=jnp.float32
                    )
                    acc = acc + jnp.dot(
                        lhs1, w1, preferred_element_type=jnp.float32
                    )
                y = _mish_f32(acc + bfv).astype(ph0_s.dtype)
                eps = jnp.dot(
                    y, wo_ref[0], preferred_element_type=jnp.float32
                ) + bov
                outs.append(eps)
            o_ref[0, r, :, :] = jnp.concatenate(outs, axis=-1).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tail_fuse_pallas(x, kt, bt, wf, bf_, wo, bo, *, interpret: bool = False):
    b, h, w, c = x.shape
    assert kt.shape == (4, 4, c, c), kt.shape
    assert wf.shape == (3, 3, c, c), wf.shape
    cout = wo.shape[-1]
    assert wo.shape == (c, cout), wo.shape
    assert h % _ROWS_IN == 0, (h, _ROWS_IN)
    dtype = x.dtype
    nb = h // _ROWS_IN

    # ConvT pack: index 4·half + 2·b + dx, rhs = [kt[ky_lo, b+2dx];
    # kt[ky_hi, b+2dx]] — the lower/upper input-row taps K-stacked (the
    # in-kernel lhs concatenates the two x ROWS at one column offset).
    # half=0 → odd out row (a=1, ky 1/3); half=1 → even out row (ky 0/2).
    kt_p = jnp.stack(
        [
            jnp.concatenate([kt[ky_lo, bb + 2 * dx], kt[ky_hi, bb + 2 * dx]], axis=0)
            for (ky_lo, ky_hi) in ((1, 3), (0, 2))
            for bb in range(2)
            for dx in range(2)
        ]
    ).astype(dtype)  # (8, 2c, c)
    # 3×3 packs (see the stage-F tap-pairing comment): wf2[0:3] = p=1's
    # [wf[dy,0]; wf[dy,1]], wf2[3:6] = p=0's [wf[dy,1]; wf[dy,2]];
    # wf1[0:3] = p=0's single wf[dy,0], wf1[3:6] = p=1's single wf[dy,2].
    wf2_p = jnp.stack(
        [jnp.concatenate([wf[dy, 0], wf[dy, 1]], axis=0) for dy in range(3)]
        + [jnp.concatenate([wf[dy, 1], wf[dy, 2]], axis=0) for dy in range(3)]
    ).astype(dtype)  # (6, 2c, c)
    wf1_p = jnp.stack(
        [wf[dy, 0] for dy in range(3)] + [wf[dy, 2] for dy in range(3)]
    ).astype(dtype)  # (6, c, c)
    biases = [v.astype(jnp.float32).reshape(1, -1) for v in (bt, bf_, bo)]
    wo_p = wo.astype(dtype).reshape(1, c, cout)

    kern = functools.partial(
        _kernel, width=w, c=c, cout=cout, out_dtype=dtype,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(
            (1, _ROWS_IN, w, c),
            lambda i, j: (i, jnp.clip(j, 0, nb - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        full, full, full, full, full, full, full,
    ]
    out_spec = pl.BlockSpec(
        (1, 2 * _ROWS_IN, w, 2 * cout),
        lambda i, j: (i, jnp.clip(j - 1, 0, nb - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, nb + 1),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, w, 2 * cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, _ROWS_IN + 1, w + 2, c), dtype),      # x + halo
            pltpu.VMEM((2, 2 * _ROWS_IN + 2, w + 2, c), dtype),  # ups phase 0
            pltpu.VMEM((2, 2 * _ROWS_IN + 2, w + 2, c), dtype),  # ups phase 1
        ],
        cost_estimate=pl.CostEstimate(
            # ConvT (4 taps/out pixel) + 3×3 (9 taps) + 1×1, all dense.
            flops=2 * b * (2 * h) * (2 * w) * (4 * c * c + 9 * c * c + c * cout),
            bytes_accessed=b * h * w * (c + 4 * cout) * dtype.itemsize,
            transcendentals=2 * b * (2 * h) * (2 * w) * c,
        ),
        interpret=interpret,
    )(x, kt_p, biases[0], wf2_p, wf1_p, biases[1], wo_p, biases[2])
    # (m, phase, c) flattens contiguously → the interleaved image is a free
    # reshape.
    return out.reshape(b, 2 * h, 2 * w, cout)


def tail_reference(x, kt, bt, wf, bf_, wo, bo, *, dtype=None):
    """XLA reference composition (also the custom-VJP backward path):
    ConvT(k4,s2,p1) + bias → reflect conv3x3 + bias + Mish → 1×1 + bias."""
    from dgm_img_super_resolution_tpu.models.layers import mish, reflect_conv3x3

    dtype = dtype or x.dtype
    x = x.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, kt.astype(dtype), (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bt.astype(dtype)
    y = mish(reflect_conv3x3(y, wf, bf_, dtype=dtype))
    return (
        jnp.einsum("bhwc,cd->bhwd", y.astype(dtype), wo.astype(dtype))
        + bo.astype(dtype)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def tail_fuse(x, kt, bt, wf, bf_, wo, bo, interpret: bool = False):
    """Fused Upsample→Block→1×1 UNet tail (see module docstring).

    ``x``: (B,H,W,C) pre-upsample activation (the up-2 chain output);
    ``kt``/``bt``: the ConvTranspose k4/s2/p1 params (HWIO, pre-flipped —
    the storage format of ``ConvTranspose2dTorch``); ``wf``/``bf_``: final
    Block conv; ``wo``/``bo``: final 1×1 (already pad-out-extended when the
    sampler carry is lane-padded). Returns (B,2H,2W,C_out). Differentiable
    via the XLA reference composition.
    """
    return _tail_fuse_pallas(x, kt, bt, wf, bf_, wo, bo, interpret=interpret)


def _tail_fwd(x, kt, bt, wf, bf_, wo, bo, interpret):
    return tail_fuse(x, kt, bt, wf, bf_, wo, bo, interpret), (
        x, kt, bt, wf, bf_, wo, bo,
    )


def _tail_bwd(interpret, res, g):
    _, vjp = jax.vjp(lambda *a: tail_reference(*a), *res)
    return vjp(g)


tail_fuse.defvjp(_tail_fwd, _tail_bwd)
