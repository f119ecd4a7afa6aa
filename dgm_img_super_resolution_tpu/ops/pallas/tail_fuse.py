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

_ROWS_IN = 8  # input rows per grid step → 16 output rows (measured best:
# 37.59 vs 37.82 ms/step in-scan over rows=4; rows=16 fails to compile —
# scoped-vmem. Falls back to 4 when 8 doesn't divide H.)


def _rows_in(h: int) -> int:
    """A/B override: DGMSR_TAIL_ROWS (must divide the pre-upsample H)."""
    import os

    env = os.environ.get("DGMSR_TAIL_ROWS")
    if env:
        rows = int(env)
        if rows % 2 == 0 and h % rows == 0:
            return rows
    return _ROWS_IN if h % _ROWS_IN == 0 else 4


def _mish_f32(x):
    x = x.astype(jnp.float32)
    return x * jnp.tanh(jax.nn.softplus(x))


def _kernel(
    x_ref, kt_ref, bt_ref, wf2_ref, wf1p_ref, wf1s_ref, bf_ref, wo_ref, bo_ref,
    o_ref, x_s, ph0_s, ph1_s,
    *, width: int, c: int, cout: int, out_dtype, rows: int,
):
    """Grid (B, nb+1). width = pre-upsample W; c = 64; cout = final lanes
    per phase (4 for the lane-padded carry)."""
    nsteps = pl.num_programs(1)
    nb = nsteps - 1
    j = pl.program_id(1)

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
        # the two dx taps would mix col offsets b and b+1). The middle taps
        # (b=0,dx=1) and (b=1,dx=0) share their lhs (col slice 1..W+1) and
        # N-pack into ONE full (W,2C)@(2C,2C) dot serving both phases.
        for P in range(rows):
            lhs = [
                jnp.concatenate(
                    [
                        x_s[x_cur, P, o : o + width, :],
                        x_s[x_cur, P + 1, o : o + width, :],
                    ],
                    axis=-1,
                )
                for o in range(3)
            ]
            for half in range(2):  # half=0 → k=2P (a=1); half=1 → k=2P+1 (a=0)
                k = 2 * P + half
                mid = jnp.dot(
                    lhs[1], kt_ref[3 * half + 1],
                    preferred_element_type=jnp.float32,
                )
                acc0 = mid[:, :c] + jnp.dot(
                    lhs[0], kt_ref[3 * half][:, :c],
                    preferred_element_type=jnp.float32,
                )
                acc1 = mid[:, c:] + jnp.dot(
                    lhs[2], kt_ref[3 * half + 2][:, :c],
                    preferred_element_type=jnp.float32,
                )
                # phase scratch: band content rows 0..7, cols 1..W.
                ph0_s[ph_cur, k, 1 : width + 1, :] = (acc0 + bt).astype(ph0_s.dtype)
                ph1_s[ph_cur, k, 1 : width + 1, :] = (acc1 + bt).astype(ph0_s.dtype)

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
            # top half of each half=0 pack applies.
            bt_ = bt_ref[0].astype(jnp.float32)
            mid = jnp.dot(
                x_s[x_cur, rows, 1 : 1 + width, :], kt_ref[1, :c],
                preferred_element_type=jnp.float32,
            )
            acc0 = mid[:, :c] + jnp.dot(
                x_s[x_cur, rows, 0:width, :], kt_ref[0, :c, :c],
                preferred_element_type=jnp.float32,
            )
            acc1 = mid[:, c:] + jnp.dot(
                x_s[x_cur, rows, 2 : 2 + width, :], kt_ref[2, :c, :c],
                preferred_element_type=jnp.float32,
            )
            ph0_s[ph_cur, rows * 2, 1 : width + 1, :] = (acc0 + bt_).astype(
                ph0_s.dtype
            )
            ph1_s[ph_cur, rows * 2, 1 : width + 1, :] = (acc1 + bt_).astype(
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
        # column offset (a Mosaic requirement), and N/K-packed so MXU passes
        # are as full as possible (an N=64 or N=4 dot occupies a full
        # 128-wide MXU slot — the first version's 16 per-phase 1×1 dots and
        # 12 half-N conv dots per block were ~40% of the kernel's slots):
        #   · the (ph0[m]‖ph1[m]) K-pack is the SAME lhs for both phases →
        #     ONE (W,2C)@(2C,2C) dot computes both phases' two middle taps
        #     (rhs = [p0-pack | p1-pack], output split at C);
        #   · each phase's remaining single taps K-pack across dy (same
        #     column offset, different rows): dy 0,1 packed + dy 2 single;
        #   · the 1×1 packs both phases: (y0‖y1) @ blockdiag(wo, wo).
        #   p=0: wf[dy,0]·ph1[m−1] + [wf[dy,1]·ph0[m] + wf[dy,2]·ph1[m]]
        #   p=1: [wf[dy,0]·ph0[m] + wf[dy,1]·ph1[m]] + wf[dy,2]·ph0[m+1]
        for r in range(2 * rows):
            acc0 = jnp.zeros((width, c), jnp.float32)
            acc1 = jnp.zeros((width, c), jnp.float32)
            for dy in range(3):
                row = r + dy
                lhs2 = jnp.concatenate(
                    [
                        ph0_s[s, row, 1 : width + 1, :],
                        ph1_s[s, row, 1 : width + 1, :],
                    ],
                    axis=-1,
                )
                both = jnp.dot(
                    lhs2, wf2_ref[dy], preferred_element_type=jnp.float32
                )
                acc0 = acc0 + both[:, :c]
                acc1 = acc1 + both[:, c:]
            # p=0 singles (ph1, col offset 0): dy 0,1 K-packed + dy 2.
            lhs01 = jnp.concatenate(
                [ph1_s[s, r, 0:width, :], ph1_s[s, r + 1, 0:width, :]], axis=-1
            )
            acc0 = acc0 + jnp.dot(
                lhs01, wf1p_ref[0], preferred_element_type=jnp.float32
            )
            acc0 = acc0 + jnp.dot(
                ph1_s[s, r + 2, 0:width, :], wf1s_ref[0],
                preferred_element_type=jnp.float32,
            )
            # p=1 singles (ph0, col offset 2): dy 0,1 K-packed + dy 2.
            lhs11 = jnp.concatenate(
                [
                    ph0_s[s, r, 2 : width + 2, :],
                    ph0_s[s, r + 1, 2 : width + 2, :],
                ],
                axis=-1,
            )
            acc1 = acc1 + jnp.dot(
                lhs11, wf1p_ref[1], preferred_element_type=jnp.float32
            )
            acc1 = acc1 + jnp.dot(
                ph0_s[s, r + 2, 2 : width + 2, :], wf1s_ref[1],
                preferred_element_type=jnp.float32,
            )
            y = jnp.concatenate(
                [
                    _mish_f32(acc0 + bfv).astype(ph0_s.dtype),
                    _mish_f32(acc1 + bfv).astype(ph0_s.dtype),
                ],
                axis=-1,
            )
            eps = jnp.dot(y, wo_ref[0], preferred_element_type=jnp.float32) + bov
            o_ref[0, r, :, :] = eps.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tail_fuse_pallas(x, kt, bt, wf, bf_, wo, bo, *, interpret: bool = False):
    b, h, w, c = x.shape
    assert kt.shape == (4, 4, c, c), kt.shape
    assert wf.shape == (3, 3, c, c), wf.shape
    cout = wo.shape[-1]
    assert wo.shape == (c, cout), wo.shape
    rows = _rows_in(h)
    assert h % rows == 0, (h, rows)
    dtype = x.dtype
    nb = h // rows

    # ConvT pack, index 3·half + slot: the lower/upper input-row taps are
    # K-stacked (the in-kernel lhs concatenates the two x ROWS at one
    # column offset); half=0 → odd out row (a=1, ky 1/3); half=1 → even
    # (ky 0/2). slot 0 = (b0,dx0) single, slot 1 = the shared-lhs middle
    # block [[k[·,2], k[·,1]]] serving BOTH phases in one 2C-wide dot,
    # slot 2 = (b1,dx1) single; singles are zero-padded to 2C cols so the
    # ref has one uniform shape (the kernel slices [:, :c]).
    def _blk(ky_lo, ky_hi, cols):
        return jnp.concatenate(
            [
                jnp.concatenate([kt[ky_lo, cc] for cc in cols], axis=1),
                jnp.concatenate([kt[ky_hi, cc] for cc in cols], axis=1),
            ],
            axis=0,
        )

    zc = jnp.zeros_like(kt[0, 0])
    kt_p = jnp.stack(
        [
            m
            for (ky_lo, ky_hi) in ((1, 3), (0, 2))
            for m in (
                jnp.concatenate(
                    [_blk(ky_lo, ky_hi, [0]), jnp.concatenate([zc, zc], 0)], axis=1
                ),
                _blk(ky_lo, ky_hi, [2, 1]),
                jnp.concatenate(
                    [_blk(ky_lo, ky_hi, [3]), jnp.concatenate([zc, zc], 0)], axis=1
                ),
            )
        ]
    ).astype(dtype)  # (6, 2c, 2c)
    # 3×3 packs (see the stage-F tap-pairing comment). The both-phase block
    # matrix: lhs (ph0[m]‖ph1[m]) @ wf2[dy] → cols [:c] = p0's middle taps
    # (wf[dy,1]·ph0 + wf[dy,2]·ph1), cols [c:] = p1's (wf[dy,0]·ph0 +
    # wf[dy,1]·ph1).
    wf2_p = jnp.stack(
        [
            jnp.concatenate(
                [
                    jnp.concatenate([wf[dy, 1], wf[dy, 0]], axis=1),
                    jnp.concatenate([wf[dy, 2], wf[dy, 1]], axis=1),
                ],
                axis=0,
            )
            for dy in range(3)
        ]
    ).astype(dtype)  # (3, 2c, 2c)
    # per-phase single taps: dy 0,1 row-K-packed + dy 2 single.
    wf1p_p = jnp.stack(
        [
            jnp.concatenate([wf[0, 0], wf[1, 0]], axis=0),  # p0
            jnp.concatenate([wf[0, 2], wf[1, 2]], axis=0),  # p1
        ]
    ).astype(dtype)  # (2, 2c, c)
    wf1s_p = jnp.stack([wf[2, 0], wf[2, 2]]).astype(dtype)  # (2, c, c)
    # 1×1 over both phases at once: (y0‖y1) @ blockdiag(wo, wo).
    z = jnp.zeros_like(wo)
    wo_p = jnp.concatenate(
        [
            jnp.concatenate([wo, z], axis=1),
            jnp.concatenate([z, wo], axis=1),
        ],
        axis=0,
    ).astype(dtype).reshape(1, 2 * c, 2 * cout)
    biases = [
        bt.astype(jnp.float32).reshape(1, -1),
        bf_.astype(jnp.float32).reshape(1, -1),
        jnp.concatenate([bo, bo]).astype(jnp.float32).reshape(1, -1),
    ]

    kern = functools.partial(
        _kernel, width=w, c=c, cout=cout, out_dtype=dtype, rows=rows,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(
            (1, rows, w, c),
            lambda i, j: (i, jnp.clip(j, 0, nb - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        full, full, full, full, full, full, full, full,
    ]
    out_spec = pl.BlockSpec(
        (1, 2 * rows, w, 2 * cout),
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
            pltpu.VMEM((2, rows + 1, w + 2, c), dtype),      # x + halo
            pltpu.VMEM((2, 2 * rows + 2, w + 2, c), dtype),  # ups phase 0
            pltpu.VMEM((2, 2 * rows + 2, w + 2, c), dtype),  # ups phase 1
        ],
        cost_estimate=pl.CostEstimate(
            # ConvT (4 taps/out pixel) + 3×3 (9 taps) + 1×1, all dense.
            flops=2 * b * (2 * h) * (2 * w) * (4 * c * c + 9 * c * c + c * cout),
            bytes_accessed=b * h * w * (c + 4 * cout) * dtype.itemsize,
            transcendentals=2 * b * (2 * h) * (2 * w) * c,
        ),
        interpret=interpret,
    )(x, kt_p, biases[0], wf2_p, wf1p_p, wf1s_p, biases[1], wo_p, biases[2])
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
