"""Fused 3-conv ResnetBlock-pair chain Pallas kernel (the 512²/C=64 region).

Round-1 lesson (docs/DESIGN.md "Conv lane-packing study"): the row-pair-packed
3×3 conv beats XLA standalone (3.16 vs ~4.0 ms at (8,512,512,64) bf16) but
loses end-to-end because every custom-call boundary costs XLA its cross-op
fusion around that Block. This kernel moves the *whole region* inside one
call: the chain of three 64→64 reflect convs that dominates the SRDiff UNet's
512² down-stage-0 (reference ``srdiff/model.py:774-781,826-832``) and the
256² up-stage-2 (``model.py:789-796``), with every elementwise epilogue
(Mish, time-embedding add, residual adds, RRDB-condition add) fused in:

    h1  = mish(a_pre) + tv1          # a_pre = block1 conv output (XLA, 3→64
                                     #   or the up-stage virtual-pair conv)
    y1  = mish(conv_b(h1)) + r1      # ResnetBlock 1 output (r1 = res_conv(x))
    h2  = mish(conv_c(y1)) + tv2
    out = mish(conv_d(h2)) + y1 [+ cond]   # ResnetBlock 2 output (+ cond add
                                     #   after down stage 0, model.py:829-832)

Each conv is the row-pair-packed MXU formulation of ``conv3x3.py`` (two
output rows per matmul → all 128 lanes full at C=64). Halos ride the same
sequential-grid lag pipeline, deepened to 3: grid step j assembles h1 block
j, computes conv_b for block j−1, conv_c for block j−2 and conv_d for block
j−3 — intermediate activations live ONLY in rolling VMEM slots (h1: 2,
y1: 3 — conv_d's residual read trails conv_b's write by two blocks —
h2: 2), so the three intermediate 512² tensors never touch HBM and XLA
keeps its fusion freedom everywhere outside the single call.

Net HBM traffic: read a_pre + r1 (+cond), write out — the unavoidable
region boundary. Grid gets 3 extra steps per image; output blocks 0..2 are
written with garbage at steps 0..2 and sequentially overwritten (same
mechanism as conv3x3.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgm_img_super_resolution_tpu.ops.pallas.conv3x3 import pack_weights

# Output rows per grid step. 4 is the validated point: 8 overflows VMEM on
# real Mosaic at W=512 (the 7 rolling (rows+2, W+2, 64→128-lane-padded) slots
# plus 4-5 double-buffered I/O streams exceed the budget; measured
# HTTP 500 tpu_compile_helper failure), 4 fits and runs the fused region at
# ~50 TFLOP/s useful vs ~30 for the XLA composition (tools/block_chain_bench.py).
_BLOCK_ROWS = 4


def chain_block_rows(h: int | None = None) -> int:
    """Output rows per grid step (A/B override: ``DGMSR_CHAIN_ROWS``).
    When ``h`` is given, falls back to the default unless the override
    divides it (the kernels require h % rows == 0 and rows % 2 == 0).
    Default: 8 at H ≤ 256 (the 256² up-stage chain — its W=256 rolling
    slots fit the scoped-vmem budget at 8 rows), 4 at 512² (8 is a
    measured scoped-vmem OOM there, 19.26 M vs the 16 M limit)."""
    import os

    env = os.environ.get("DGMSR_CHAIN_ROWS")
    if env:
        rows = int(env)
        if rows % 2 == 0 and (h is None or h % rows == 0):
            return rows
    if h is not None and h <= 256 and h % 8 == 0:
        return 8
    return _BLOCK_ROWS


def _mish_f32(x):
    x = x.astype(jnp.float32)
    return x * jnp.tanh(jax.nn.softplus(x))


def _rowpack_matmul(scratch, slot, w_ref, rows: int, width: int, c: int):
    """All row-pair matmuls over one completed (rows+2, width+2, c) slot.

    Returns a list of ``rows // 2`` f32 (width, 2c) accumulators (bias and
    epilogues are applied by the caller). C=64 only: the pairing fills the
    128 lanes; Mosaic rejects the lane-concats past one tile at C≥128
    ("Input offsets outside of the first tile").
    """
    accs = []
    for r in range(rows // 2):
        acc = jnp.zeros((width, 2 * c), jnp.float32)
        for p in range(6):
            dx = p // 2
            dy0 = (p % 2) * 2
            base = 2 * r + dy0
            xa = scratch[slot, base, dx : dx + width, :]
            xb = scratch[slot, base + 1, dx : dx + width, :]
            xcat = jnp.concatenate([xa, xb], axis=-1)
            acc = acc + jnp.dot(xcat, w_ref[p], preferred_element_type=jnp.float32)
        accs.append(acc)
    return accs


def _rows_matmul(scratch, slot, w_ref, rows: int, width: int, c: int):
    """Per-row 3×3 conv matmuls over one completed (rows+2, width+2, c) slot
    — the C≥128 mode: lanes are already full without row-pairing, so each
    output row is 9 plain (W,C)@(C,C) MXU dots and NO lane concats appear
    anywhere (w_ref is the unpacked (9, C, C) kernel, p = dy·3 + dx).

    Returns a list of ``rows`` f32 (width, c) accumulators.
    """
    accs = []
    for i in range(rows):
        acc = jnp.zeros((width, c), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xa = scratch[slot, i + dy, dx : dx + width, :]
                acc = acc + jnp.dot(
                    xa, w_ref[dy * 3 + dx], preferred_element_type=jnp.float32
                )
        accs.append(acc)
    return accs


def _kernel(
    a_ref, r1_ref, tv1_ref, tv2_ref, wb_ref, bb_ref, wc_ref, bc_ref,
    wd_ref, bd_ref, *rest,
    rows: int, width: int, c: int, has_cond: bool, out_dtype, packed: bool,
):
    if has_cond:
        cond_ref, o_ref, h1_s, y1_s, h2_s = rest
    else:
        o_ref, h1_s, y1_s, h2_s = rest
        cond_ref = None
    nsteps = pl.num_programs(1)  # nb + 3
    nb = nsteps - 3
    j = pl.program_id(1)

    def _col_border(scr, slot, row_lo, row_hi):
        # reflect: col −1 ≡ col 1, col W ≡ col W−2 (torch ReflectionPad2d).
        scr[slot, row_lo:row_hi, 0, :] = scr[slot, row_lo:row_hi, 2, :]
        scr[slot, row_lo:row_hi, width + 1, :] = scr[slot, row_lo:row_hi, width - 1, :]

    def _col_border_row(scr, slot, row):
        scr[slot, row, 0, :] = scr[slot, row, 2, :]
        scr[slot, row, width + 1, :] = scr[slot, row, width - 1, :]

    # ---- stage A: assemble h1 block j = mish(a_pre) + tv1 (active j < nb).
    h1_cur = jax.lax.rem(j, 2)
    h1_prev = 1 - h1_cur

    @pl.when(j < nb)
    def _assemble():
        tv1 = tv1_ref[0, 0].astype(jnp.float32)
        h1 = (_mish_f32(a_ref[0]) + tv1).astype(h1_s.dtype)
        h1_s[h1_cur, 1 : rows + 1, 1 : width + 1, :] = h1

        @pl.when(j > 0)
        def _():
            h1_s[h1_cur, 0, :, :] = h1_s[h1_prev, rows, :, :]

        @pl.when(j == 0)
        def _():
            # image top: row −1 ≡ row 1 = this block's second row.
            h1_s[h1_cur, 0, 1 : width + 1, :] = h1[1]

        _col_border(h1_s, h1_cur, 0, rows + 1)

    # ---- stage B: conv_b for block j−1 → y1 (active 1 ≤ j ≤ nb).
    @pl.when(jnp.logical_and(j >= 1, j <= nb))
    def _conv_b():
        # complete h1 block j−1's bottom halo.
        @pl.when(j <= nb - 1)
        def _():
            tv1 = tv1_ref[0, 0].astype(jnp.float32)
            h1_s[h1_prev, rows + 1, 1 : width + 1, :] = (
                _mish_f32(a_ref[0, 0]) + tv1
            ).astype(h1_s.dtype)
            _col_border_row(h1_s, h1_prev, rows + 1)

        @pl.when(j == nb)
        def _():
            # image bottom: row H ≡ row H−2.
            h1_s[h1_prev, rows + 1, :, :] = h1_s[h1_prev, rows - 1, :, :]

        y1_slot = jax.lax.rem(j - 1, 3)
        if packed:
            bias2 = jnp.concatenate([bb_ref[0], bb_ref[0]]).astype(jnp.float32)
            accs = _rowpack_matmul(h1_s, h1_prev, wb_ref, rows, width, c)
            for r, acc in enumerate(accs):
                r1a = r1_ref[0, 2 * r, :, :]
                r1b = r1_ref[0, 2 * r + 1, :, :]
                r1cat = jnp.concatenate([r1a, r1b], axis=-1).astype(jnp.float32)
                y = (_mish_f32(acc + bias2) + r1cat).astype(y1_s.dtype)
                y1_s[y1_slot, 1 + 2 * r, 1 : width + 1, :] = y[:, :c]
                y1_s[y1_slot, 2 + 2 * r, 1 : width + 1, :] = y[:, c:]
        else:
            bias = bb_ref[0].astype(jnp.float32)
            for i, acc in enumerate(_rows_matmul(h1_s, h1_prev, wb_ref, rows, width, c)):
                r1i = r1_ref[0, i, :, :].astype(jnp.float32)
                y = (_mish_f32(acc + bias) + r1i).astype(y1_s.dtype)
                y1_s[y1_slot, 1 + i, 1 : width + 1, :] = y
        # top halo of block j−1.
        @pl.when(j > 1)
        def _():
            y1_s[y1_slot, 0, :, :] = y1_s[jax.lax.rem(j - 2, 3), rows, :, :]

        @pl.when(j == 1)
        def _():
            y1_s[y1_slot, 0, 1 : width + 1, :] = y1_s[y1_slot, 2, 1 : width + 1, :]

        _col_border(y1_s, y1_slot, 0, rows + 1)
        # bottom halo of block j−2 = this block's first row.
        @pl.when(j > 1)
        def _():
            y1_s[jax.lax.rem(j - 2, 3), rows + 1, :, :] = y1_s[y1_slot, 1, :, :]

    @pl.when(j == nb + 1)
    def _y1_last_halo():
        # image bottom for y1 block nb−1.
        s = jax.lax.rem(nb - 1, 3)
        y1_s[s, rows + 1, :, :] = y1_s[s, rows - 1, :, :]

    # ---- stage C: conv_c for block j−2 → h2 (active 2 ≤ j ≤ nb+1).
    @pl.when(jnp.logical_and(j >= 2, j <= nb + 1))
    def _conv_c():
        h2_slot = jax.lax.rem(j - 2, 2)
        y1_slot = jax.lax.rem(j - 2, 3)
        tv2 = tv2_ref[0, 0].astype(jnp.float32)
        if packed:
            bias2 = jnp.concatenate([bc_ref[0], bc_ref[0]]).astype(jnp.float32)
            tv2cat = jnp.concatenate([tv2, tv2])
            accs = _rowpack_matmul(y1_s, y1_slot, wc_ref, rows, width, c)
            for r, acc in enumerate(accs):
                h = (_mish_f32(acc + bias2) + tv2cat).astype(h2_s.dtype)
                h2_s[h2_slot, 1 + 2 * r, 1 : width + 1, :] = h[:, :c]
                h2_s[h2_slot, 2 + 2 * r, 1 : width + 1, :] = h[:, c:]
        else:
            bias = bc_ref[0].astype(jnp.float32)
            for i, acc in enumerate(_rows_matmul(y1_s, y1_slot, wc_ref, rows, width, c)):
                h = (_mish_f32(acc + bias) + tv2).astype(h2_s.dtype)
                h2_s[h2_slot, 1 + i, 1 : width + 1, :] = h
        @pl.when(j > 2)
        def _():
            h2_s[h2_slot, 0, :, :] = h2_s[1 - h2_slot, rows, :, :]

        @pl.when(j == 2)
        def _():
            h2_s[h2_slot, 0, 1 : width + 1, :] = h2_s[h2_slot, 2, 1 : width + 1, :]

        _col_border(h2_s, h2_slot, 0, rows + 1)
        @pl.when(j > 2)
        def _():
            h2_s[1 - h2_slot, rows + 1, :, :] = h2_s[h2_slot, 1, :, :]

    @pl.when(j == nb + 2)
    def _h2_last_halo():
        s = jax.lax.rem(nb - 1, 2)
        h2_s[s, rows + 1, :, :] = h2_s[s, rows - 1, :, :]

    # ---- stage D: conv_d for block j−3 → out (active 3 ≤ j ≤ nb+2).
    @pl.when(j >= 3)
    def _conv_d():
        h2_slot = jax.lax.rem(j - 3, 2)
        y1_slot = jax.lax.rem(j - 3, 3)
        if packed:
            bias2 = jnp.concatenate([bd_ref[0], bd_ref[0]]).astype(jnp.float32)
            accs = _rowpack_matmul(h2_s, h2_slot, wd_ref, rows, width, c)
            for r, acc in enumerate(accs):
                ya = y1_s[y1_slot, 1 + 2 * r, 1 : width + 1, :]
                yb = y1_s[y1_slot, 2 + 2 * r, 1 : width + 1, :]
                ycat = jnp.concatenate([ya, yb], axis=-1).astype(jnp.float32)
                out = _mish_f32(acc + bias2) + ycat
                if cond_ref is not None:
                    ca = cond_ref[0, 2 * r, :, :]
                    cb = cond_ref[0, 2 * r + 1, :, :]
                    out = out + jnp.concatenate([ca, cb], axis=-1).astype(jnp.float32)
                out = out.astype(out_dtype)
                o_ref[0, 2 * r, :, :] = out[:, :c]
                o_ref[0, 2 * r + 1, :, :] = out[:, c:]
        else:
            bias = bd_ref[0].astype(jnp.float32)
            for i, acc in enumerate(_rows_matmul(h2_s, h2_slot, wd_ref, rows, width, c)):
                yi = y1_s[y1_slot, 1 + i, 1 : width + 1, :].astype(jnp.float32)
                out = _mish_f32(acc + bias) + yi
                if cond_ref is not None:
                    out = out + cond_ref[0, i, :, :].astype(jnp.float32)
                o_ref[0, i, :, :] = out.astype(out_dtype)


def block_chain3_reference(
    a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, cond=None, *, dtype=None
):
    """XLA reference composition (also the custom-VJP backward path)."""
    from dgm_img_super_resolution_tpu.models.layers import mish, reflect_conv3x3

    dtype = dtype or a_pre.dtype
    h1 = (mish(a_pre.astype(jnp.float32)) + tv1[:, None, None, :]).astype(dtype)
    y1 = mish(reflect_conv3x3(h1, wb, bb, dtype=dtype).astype(jnp.float32)).astype(
        dtype
    ) + r1.astype(dtype)
    h2 = (
        mish(reflect_conv3x3(y1, wc, bc, dtype=dtype).astype(jnp.float32))
        + tv2[:, None, None, :]
    ).astype(dtype)
    out = mish(reflect_conv3x3(h2, wd, bd, dtype=dtype).astype(jnp.float32)).astype(
        dtype
    ) + y1
    if cond is not None:
        out = out + cond.astype(dtype)
    return out


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _block_chain3_pallas(
    a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, cond=None,
    *, block_rows: int = _BLOCK_ROWS, interpret: bool = False,
):
    b, h, w, c = a_pre.shape
    assert h % block_rows == 0 and block_rows % 2 == 0, (h, block_rows)
    for k in (wb, wc, wd):
        assert k.shape == (3, 3, c, c), k.shape
    dtype = a_pre.dtype
    nb = h // block_rows
    has_cond = cond is not None

    # C=64: row-pair-packed weights (fills the 128 lanes). C≥128: lanes are
    # already full — unpacked (9,C,C) weights, per-row dots, no lane concats
    # (Mosaic rejects concatenate past one 128-lane tile).
    is_packed = c == 64
    if is_packed:
        packed = [pack_weights(k.astype(jnp.float32)).astype(dtype) for k in (wb, wc, wd)]
    else:
        packed = [k.astype(dtype).reshape(9, c, c) for k in (wb, wc, wd)]
    biases = [x.astype(jnp.float32).reshape(1, c) for x in (bb, bc, bd)]
    # (B,C) → (B,1,C): the per-batch block (1,1,C) then has its last two dims
    # equal to the array dims, which real Mosaic lowering requires (a (1,C)
    # block on a (B,C) array violates the sublane-divisibility rule).
    tvs = [x.astype(jnp.float32).reshape(b, 1, c) for x in (tv1, tv2)]

    kern = functools.partial(
        _kernel, rows=block_rows, width=w, c=c, has_cond=has_cond, out_dtype=dtype,
        packed=is_packed,
    )
    stream = lambda off: pl.BlockSpec(  # noqa: E731
        (1, block_rows, w, c),
        lambda i, j, off=off: (i, jnp.clip(j - off, 0, nb - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    vec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        stream(0),   # a_pre
        stream(1),   # r1
        vec, vec,    # tv1, tv2
        full, full, full, full, full, full,  # packed weights + biases
    ]
    inputs = [a_pre, r1, tvs[0], tvs[1],
              packed[0], biases[0], packed[1], biases[1], packed[2], biases[2]]
    if has_cond:
        in_specs.append(stream(3))
        inputs.append(cond)

    return pl.pallas_call(
        kern,
        grid=(b, nb + 3),
        in_specs=in_specs,
        out_specs=stream(3),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows + 2, w + 2, c), dtype),  # h1
            pltpu.VMEM((3, block_rows + 2, w + 2, c), dtype),  # y1
            pltpu.VMEM((2, block_rows + 2, w + 2, c), dtype),  # h2
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * h * w * 12 * c * 2 * c,
            bytes_accessed=(4 + has_cond) * b * h * w * c * dtype.itemsize,
            transcendentals=4 * b * h * w * c,
        ),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def block_chain3(
    a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, cond,
    block_rows: int = _BLOCK_ROWS, interpret: bool = False,
):
    """Fused ResnetBlock-pair chain (see module docstring).

    ``a_pre``/``r1``: (B,H,W,C) block1-conv output and residual-conv output;
    ``tv1``/``tv2``: (B,C) per-ResnetBlock time-embedding vectors; ``w*``/
    ``b*``: the three chained (3,3,C,C)/(C,) conv params; ``cond``: optional
    (B,H,W,C) RRDB condition added to the final output. Differentiable via
    the XLA reference composition.
    """
    return _block_chain3_pallas(
        a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, cond,
        block_rows=block_rows, interpret=interpret,
    )


def _chain_fwd(a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, cond,
               block_rows, interpret):
    out = block_chain3(
        a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, cond, block_rows, interpret
    )
    return out, (a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, cond)


def _chain_bwd(block_rows, interpret, res, g):
    (a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, cond) = res
    if cond is None:
        _, vjp = jax.vjp(
            lambda *a: block_chain3_reference(*a, None),
            a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd,
        )
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        block_chain3_reference, a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, cond
    )
    return vjp(g)


block_chain3.defvjp(_chain_fwd, _chain_bwd)


# ---------------------------------------------------------------------------
# Stem-fused variant (down stage 0): the 3→64 stem conv and the 3→64 1×1
# residual conv move INSIDE the chain call (VERDICT r2 #3a). The XLA stem
# runs at ~2 TFLOP/s (lane-starved C_in=3 at 512², ~3.3 ms/step at B=8,
# docs/DESIGN.md "Thin-stem conv study") and its output + the r1 output are
# a materialisation boundary: XLA writes (B,512,512,64)·2 tensors the chain
# kernel immediately re-reads (~4×33.5 MB/img/step of pure HBM traffic).
# In-kernel both convs are nearly free: the stem is the same row-pair-packed
# formulation with K = 2·4 (x is zero-padded 3→4 channels for lane
# alignment) — 12 (W,4)@(4,128) MXU dots per row pair vs the 6 full
# (W,128)@(128,128) passes of each 64→64 conv — and r1 is one (W,4)@(4,64)
# dot per row folded into conv_b's epilogue.
#
# Pipeline deepens to 4 lags (grid nb + 4): step j assembles x block j into
# a 3-slot rolling scratch (conv_a reads lag 1 with halo; conv_b's r1
# epilogue reads lag 2, content rows only), conv_a computes h1 block j−1,
# conv_b y1 block j−2, conv_c h2 block j−3, conv_d the output block j−4.
# Net HBM traffic becomes: read x (3-ch) + cond, write out — the stem-side
# region boundary shrinks from 2×64-ch reads to one 3-ch read.


def _kernel_stem(
    x_ref, tv1_ref, tv2_ref, wa_ref, ba_ref, wr_ref, br_ref,
    wb_ref, bb_ref, wc_ref, bc_ref, wd_ref, bd_ref, *rest,
    rows: int, width: int, c: int, has_cond: bool, out_dtype,
    has_ds: bool = False,
):
    rest = list(rest)
    cond_ref = rest.pop(0) if has_cond else None
    if has_ds:
        wds2_ref, wds1_ref, bds_ref = rest[:3]
        o_ref, o2_ref, x_s, h1_s, y1_s, h2_s, oute_s, outo_s = rest[3:]
    else:
        o_ref, x_s, h1_s, y1_s, h2_s = rest
    nsteps = pl.num_programs(1)  # nb + 4
    nb = nsteps - 4
    j = pl.program_id(1)

    def _col_border(scr, slot, row_lo, row_hi, w_=width):
        scr[slot, row_lo:row_hi, 0, :] = scr[slot, row_lo:row_hi, 2, :]
        scr[slot, row_lo:row_hi, w_ + 1, :] = scr[slot, row_lo:row_hi, w_ - 1, :]

    def _col_border_row(scr, slot, row):
        scr[slot, row, 0, :] = scr[slot, row, 2, :]
        scr[slot, row, width + 1, :] = scr[slot, row, width - 1, :]

    def _small_matmul(scratch, slot, w_ref_, cin: int):
        """Row-pair rowpack passes for the thin stem: two K=cin dots per
        (dx, dy-pair) block instead of a lane-concat (cin is tiny)."""
        accs = []
        for r in range(rows // 2):
            acc = jnp.zeros((width, 2 * c), jnp.float32)
            for p in range(6):
                dx = p // 2
                dy0 = (p % 2) * 2
                base = 2 * r + dy0
                xa = scratch[slot, base, dx : dx + width, :]
                xb = scratch[slot, base + 1, dx : dx + width, :]
                acc = acc + jnp.dot(
                    xa, w_ref_[p, :cin], preferred_element_type=jnp.float32
                )
                acc = acc + jnp.dot(
                    xb, w_ref_[p, cin:], preferred_element_type=jnp.float32
                )
            accs.append(acc)
        return accs

    # ---- stage X: assemble x block j into slot j%3 (active j < nb).
    x_cur = jax.lax.rem(j, 3)
    x_prev = jax.lax.rem(j + 2, 3)  # (j-1) % 3

    @pl.when(j < nb)
    def _assemble_x():
        x_s[x_cur, 1 : rows + 1, 1 : width + 1, :] = x_ref[0]

        @pl.when(j > 0)
        def _():
            x_s[x_cur, 0, :, :] = x_s[x_prev, rows, :, :]

        @pl.when(j == 0)
        def _():
            # image top: row −1 ≡ row 1 = this block's second row.
            x_s[x_cur, 0, 1 : width + 1, :] = x_ref[0, 1]

        _col_border(x_s, x_cur, 0, rows + 1)

    # ---- stage A: conv_a (stem) for x block j−1 → h1 (active 1 ≤ j ≤ nb).
    h1_cur = jax.lax.rem(j + 1, 2)  # (j-1) % 2
    h1_prev = 1 - h1_cur

    @pl.when(jnp.logical_and(j >= 1, j <= nb))
    def _conv_a():
        # complete x block j−1's bottom halo.
        @pl.when(j <= nb - 1)
        def _():
            x_s[x_prev, rows + 1, 1 : width + 1, :] = x_ref[0, 0]
            _col_border_row(x_s, x_prev, rows + 1)

        @pl.when(j == nb)
        def _():
            # image bottom: row H ≡ row H−2.
            x_s[x_prev, rows + 1, :, :] = x_s[x_prev, rows - 1, :, :]

        ba2 = jnp.concatenate([ba_ref[0], ba_ref[0]]).astype(jnp.float32)
        tv1 = tv1_ref[0, 0].astype(jnp.float32)
        tv1cat = jnp.concatenate([tv1, tv1])
        accs = _small_matmul(x_s, x_prev, wa_ref, 4)
        for r, acc in enumerate(accs):
            h = (_mish_f32(acc + ba2) + tv1cat).astype(h1_s.dtype)
            h1_s[h1_cur, 1 + 2 * r, 1 : width + 1, :] = h[:, :c]
            h1_s[h1_cur, 2 + 2 * r, 1 : width + 1, :] = h[:, c:]
        @pl.when(j > 1)
        def _():
            h1_s[h1_cur, 0, :, :] = h1_s[h1_prev, rows, :, :]

        @pl.when(j == 1)
        def _():
            h1_s[h1_cur, 0, 1 : width + 1, :] = h1_s[h1_cur, 2, 1 : width + 1, :]

        _col_border(h1_s, h1_cur, 0, rows + 1)

    # ---- stage B: conv_b for h1 block j−2 → y1 (active 2 ≤ j ≤ nb+1).
    @pl.when(jnp.logical_and(j >= 2, j <= nb + 1))
    def _conv_b():
        h1_rd = jax.lax.rem(j, 2)  # (j-2) % 2
        # bottom halo of h1 block j−2: h1 block j−1's first content row
        # (stage A, which runs earlier this step, just wrote it) — or the
        # image-bottom reflection for the last block.
        @pl.when(j <= nb)
        def _():
            h1_s[h1_rd, rows + 1, :, :] = h1_s[1 - h1_rd, 1, :, :]

        @pl.when(j == nb + 1)
        def _():
            h1_s[h1_rd, rows + 1, :, :] = h1_s[h1_rd, rows - 1, :, :]

        y1_slot = jax.lax.rem(j - 2, 3)
        x_rd = jax.lax.rem(j + 1, 3)  # (j-2) % 3: r1's input rows
        bias2 = jnp.concatenate([bb_ref[0], bb_ref[0]]).astype(jnp.float32)
        br2 = jnp.concatenate([br_ref[0], br_ref[0]]).astype(jnp.float32)
        accs = _rowpack_matmul(h1_s, h1_rd, wb_ref, rows, width, c)
        for r, acc in enumerate(accs):
            xa = x_s[x_rd, 1 + 2 * r, 1 : width + 1, :]
            xb = x_s[x_rd, 2 + 2 * r, 1 : width + 1, :]
            r1cat = jnp.concatenate(
                [
                    jnp.dot(xa, wr_ref[0], preferred_element_type=jnp.float32),
                    jnp.dot(xb, wr_ref[0], preferred_element_type=jnp.float32),
                ],
                axis=-1,
            ) + br2
            y = (_mish_f32(acc + bias2) + r1cat).astype(y1_s.dtype)
            y1_s[y1_slot, 1 + 2 * r, 1 : width + 1, :] = y[:, :c]
            y1_s[y1_slot, 2 + 2 * r, 1 : width + 1, :] = y[:, c:]
        @pl.when(j > 2)
        def _():
            y1_s[y1_slot, 0, :, :] = y1_s[jax.lax.rem(j - 3, 3), rows, :, :]

        @pl.when(j == 2)
        def _():
            y1_s[y1_slot, 0, 1 : width + 1, :] = y1_s[y1_slot, 2, 1 : width + 1, :]

        _col_border(y1_s, y1_slot, 0, rows + 1)
        # bottom halo of y1 block j−3 = this block's first row.
        @pl.when(j > 2)
        def _():
            y1_s[jax.lax.rem(j - 3, 3), rows + 1, :, :] = y1_s[y1_slot, 1, :, :]

    @pl.when(j == nb + 2)
    def _y1_last_halo():
        s = jax.lax.rem(nb - 1, 3)
        y1_s[s, rows + 1, :, :] = y1_s[s, rows - 1, :, :]

    # ---- stage C: conv_c for y1 block j−3 → h2 (active 3 ≤ j ≤ nb+2).
    @pl.when(jnp.logical_and(j >= 3, j <= nb + 2))
    def _conv_c():
        h2_slot = jax.lax.rem(j + 1, 2)  # (j-3) % 2
        y1_rd = jax.lax.rem(j, 3)  # (j-3) % 3
        bias2 = jnp.concatenate([bc_ref[0], bc_ref[0]]).astype(jnp.float32)
        tv2 = tv2_ref[0, 0].astype(jnp.float32)
        tv2cat = jnp.concatenate([tv2, tv2])
        accs = _rowpack_matmul(y1_s, y1_rd, wc_ref, rows, width, c)
        for r, acc in enumerate(accs):
            h = (_mish_f32(acc + bias2) + tv2cat).astype(h2_s.dtype)
            h2_s[h2_slot, 1 + 2 * r, 1 : width + 1, :] = h[:, :c]
            h2_s[h2_slot, 2 + 2 * r, 1 : width + 1, :] = h[:, c:]
        @pl.when(j > 3)
        def _():
            h2_s[h2_slot, 0, :, :] = h2_s[1 - h2_slot, rows, :, :]

        @pl.when(j == 3)
        def _():
            h2_s[h2_slot, 0, 1 : width + 1, :] = h2_s[h2_slot, 2, 1 : width + 1, :]

        _col_border(h2_s, h2_slot, 0, rows + 1)
        @pl.when(j > 3)
        def _():
            h2_s[1 - h2_slot, rows + 1, :, :] = h2_s[h2_slot, 1, :, :]

    @pl.when(j == nb + 3)
    def _h2_last_halo():
        s = jax.lax.rem(nb - 1, 2)
        h2_s[s, rows + 1, :, :] = h2_s[s, rows - 1, :, :]

    # ---- stage D: conv_d for h2 block j−4 → out (active j ≥ 4); in ds
    # mode the fused Downsample of the same block runs at the END of the
    # step (the ring is complete once this block's rows and the previous
    # block's last row are stored — no extra pipeline lag, no trailing
    # grid step whose unwritten output buffer would clobber the last
    # block).
    @pl.when(j >= 4)
    def _conv_d():
        h2_rd = jax.lax.rem(j, 2)  # (j-4) % 2
        y1_rd = jax.lax.rem(j + 2, 3)  # (j-4) % 3
        bias2 = jnp.concatenate([bd_ref[0], bd_ref[0]]).astype(jnp.float32)
        accs = _rowpack_matmul(h2_s, h2_rd, wd_ref, rows, width, c)
        os_cur = jax.lax.rem(j, 2)  # out-ring slot (j-4) % 2, ds mode only
        for r, acc in enumerate(accs):
            ya = y1_s[y1_rd, 1 + 2 * r, 1 : width + 1, :]
            yb = y1_s[y1_rd, 2 + 2 * r, 1 : width + 1, :]
            ycat = jnp.concatenate([ya, yb], axis=-1).astype(jnp.float32)
            out = _mish_f32(acc + bias2) + ycat
            if cond_ref is not None:
                ca = cond_ref[0, 2 * r, :, :]
                cb = cond_ref[0, 2 * r + 1, :, :]
                out = out + jnp.concatenate([ca, cb], axis=-1).astype(jnp.float32)
            out = out.astype(out_dtype)
            o_ref[0, 2 * r, :, :] = out[:, :c]
            o_ref[0, 2 * r + 1, :, :] = out[:, c:]
            if has_ds:
                # keep the out rows for the fused Downsample (stage E),
                # phase-split along columns via a sublane reshape (strided
                # slicing is not expressible; the reshape is): ring slot
                # rows 1..rows = out rows of this block, cols 1..W/2.
                wd2 = width // 2
                for half, row_v in ((0, out[:, :c]), (1, out[:, c:])):
                    ph = row_v.reshape(wd2, 2, c)
                    oute_s[os_cur, 1 + 2 * r + half, 1 : wd2 + 1, :] = ph[:, 0, :]
                    outo_s[os_cur, 1 + 2 * r + half, 1 : wd2 + 1, :] = ph[:, 1, :]
        if has_ds:
            wd2 = width // 2
            # reflect left halo of the odd phase: ds col 0's leftmost tap is
            # image col −1 ≡ col 1 = odd-phase col 0 (its content col 1).
            oute_s[os_cur, 1 : rows + 1, 0, :] = oute_s[os_cur, 1 : rows + 1, 1, :]
            outo_s[os_cur, 1 : rows + 1, 0, :] = outo_s[os_cur, 1 : rows + 1, 1, :]
            # top halo row: out row 4k−1 (previous block's last row), or the
            # image-top reflection (out row −1 ≡ out row 1) for block 0.
            @pl.when(j > 4)
            def _():
                for scr in (oute_s, outo_s):
                    scr[os_cur, 0, :, :] = scr[1 - os_cur, rows, :, :]

            @pl.when(j == 4)
            def _():
                for scr in (oute_s, outo_s):
                    scr[os_cur, 0, :, :] = scr[os_cur, 2, :, :]

            # fused Downsample — stride-2 reflect conv of THIS block → o2.
            # ds row m reads out rows 2m−1..2m+1 (ring rows 2m_loc..+2);
            # per dy the even/odd phase taps are one K-packed
            # (W/2,2C)@(2C,C) dot plus the odd-phase left-tap single.
            bds = bds_ref[0].astype(jnp.float32)
            for m_loc in range(rows // 2):
                acc2 = jnp.zeros((wd2, c), jnp.float32)
                for dy in range(3):
                    row = 2 * m_loc + dy
                    lhs2 = jnp.concatenate(
                        [
                            oute_s[os_cur, row, 1 : wd2 + 1, :],
                            outo_s[os_cur, row, 1 : wd2 + 1, :],
                        ],
                        axis=-1,
                    )
                    acc2 = acc2 + jnp.dot(
                        lhs2, wds2_ref[dy], preferred_element_type=jnp.float32
                    )
                    acc2 = acc2 + jnp.dot(
                        outo_s[os_cur, row, 0:wd2, :], wds1_ref[dy],
                        preferred_element_type=jnp.float32,
                    )
                o2_ref[0, m_loc, :, :] = (acc2 + bds).astype(out_dtype)


def block_chain3_stem_reference(
    x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond=None, *, dtype=None
):
    """XLA reference composition (also the custom-VJP backward path):
    stem reflect conv + 1×1 residual conv + the 3-conv chain."""
    from dgm_img_super_resolution_tpu.models.layers import reflect_conv3x3

    dtype = dtype or x.dtype
    if x.shape[-1] > wa.shape[2]:
        # lane-padded sampler carry (diffusion/gaussian.py pad_carry_lanes):
        # zero-pad the stem weights' input dim so the dead x lanes multiply
        # zeros — identical to the Pallas kernel's internal padding.
        d = x.shape[-1] - wa.shape[2]
        wa = jnp.pad(wa, ((0, 0), (0, 0), (0, d), (0, 0)))
        wr = jnp.pad(wr, ((0, d), (0, 0)))
    a_pre = reflect_conv3x3(x, wa, ba, dtype=dtype)
    r1 = (
        jnp.einsum("bhwc,cd->bhwd", x.astype(dtype), wr.astype(dtype))
        + br.astype(dtype)
    )
    return block_chain3_reference(
        a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, cond, dtype=dtype
    )


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _block_chain3_stem_pallas(
    x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond=None,
    wds=None, bds=None,
    *, block_rows: int = _BLOCK_ROWS, interpret: bool = False,
):
    b, h, w, xc = x.shape
    has_ds = wds is not None
    if has_ds:
        assert wds.shape == (3, 3, wa.shape[-1], wa.shape[-1]), wds.shape
        assert w % 2 == 0 and h % 2 == 0, (h, w)
    c = wa.shape[-1]
    cin = wa.shape[2]
    assert h % block_rows == 0 and block_rows % 2 == 0, (h, block_rows)
    assert wa.shape == (3, 3, cin, c), wa.shape
    assert wr.shape == (cin, c), wr.shape
    for k in (wb, wc, wd):
        assert k.shape == (3, 3, c, c), k.shape
    dtype = x.dtype
    nb = h // block_rows
    has_cond = cond is not None

    # zero-pad x (and the stem weights' input dim) 3→4 channels: every
    # in-kernel slice and dot stays 4-lane aligned; the pad channel is
    # multiplied by zero weights so the math is unchanged. The sampler may
    # hand x over already lane-padded (gaussian.py pad_carry_lanes — keeps
    # any C=3-minor tensor out of the scan); then only the weights pad here.
    cp = 4
    assert cin <= cp and xc in (cin, cp), (cin, xc)
    if xc < cp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - xc)))
    if cin < cp:
        wa = jnp.pad(wa, ((0, 0), (0, 0), (0, cp - cin), (0, 0)))
        wr = jnp.pad(wr, ((0, cp - cin), (0, 0)))

    wa_p = pack_weights(wa.astype(jnp.float32)).astype(dtype)  # (6, 2·4, 2c)
    wbcd_p = [pack_weights(k.astype(jnp.float32)).astype(dtype) for k in (wb, wc, wd)]
    biases = [v.astype(jnp.float32).reshape(1, c) for v in (ba, br, bb, bc, bd)]
    wr_p = wr.astype(dtype).reshape(1, cp, c)
    tvs = [v.astype(jnp.float32).reshape(b, 1, c) for v in (tv1, tv2)]

    kern = functools.partial(
        _kernel_stem, rows=block_rows, width=w, c=c, has_cond=has_cond,
        out_dtype=dtype, has_ds=has_ds,
    )

    def stream(off, ch):
        return pl.BlockSpec(
            (1, block_rows, w, ch),
            lambda i, j, off=off: (i, jnp.clip(j - off, 0, nb - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    vec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        stream(0, cp),        # x
        vec, vec,             # tv1, tv2
        full, full,           # wa packed, ba
        full, full,           # wr, br
        full, full, full, full, full, full,  # wb/bb, wc/bc, wd/bd
    ]
    inputs = [x, tvs[0], tvs[1], wa_p, biases[0], wr_p, biases[1],
              wbcd_p[0], biases[2], wbcd_p[1], biases[3], wbcd_p[2], biases[4]]
    if has_cond:
        in_specs.append(stream(4, c))
        inputs.append(cond)
    out_specs = stream(4, c)
    out_shape = jax.ShapeDtypeStruct((b, h, w, c), dtype)
    scratch = [
        pltpu.VMEM((3, block_rows + 2, w + 2, cp), dtype),  # x
        pltpu.VMEM((2, block_rows + 2, w + 2, c), dtype),   # h1
        pltpu.VMEM((3, block_rows + 2, w + 2, c), dtype),   # y1
        pltpu.VMEM((2, block_rows + 2, w + 2, c), dtype),   # h2
    ]
    if has_ds:
        # fused Downsample: per-dy K-packs [k1;k2] over the (even‖odd-phase)
        # columns + the odd-phase left-tap single (see _kernel_stem stage E).
        wds2_p = jnp.stack(
            [jnp.concatenate([wds[dy, 1], wds[dy, 2]], axis=0) for dy in range(3)]
        ).astype(dtype)
        wds1_p = jnp.stack([wds[dy, 0] for dy in range(3)]).astype(dtype)
        in_specs += [full, full, full]
        inputs += [wds2_p, wds1_p, bds.astype(jnp.float32).reshape(1, c)]
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (1, block_rows // 2, w // 2, c),
                lambda i, j: (i, jnp.clip(j - 4, 0, nb - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((b, h // 2, w // 2, c), dtype),
        ]
        scratch += [
            pltpu.VMEM((2, block_rows + 1, w // 2 + 1, c), dtype),  # out even
            pltpu.VMEM((2, block_rows + 1, w // 2 + 1, c), dtype),  # out odd
        ]

    return pl.pallas_call(
        kern,
        grid=(b, nb + 4),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w
            * (12 * cp * 2 * c + 3 * 12 * c * 2 * c + cin * c)
            + (2 * b * (h // 2) * (w // 2) * 9 * c * c if has_ds else 0),
            bytes_accessed=(
                b * h * w * (cp + (1 + has_cond) * c) * dtype.itemsize
            ),
            transcendentals=4 * b * h * w * c,
        ),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15))
def block_chain3_stem(
    x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond,
    block_rows: int = _BLOCK_ROWS, interpret: bool = False,
):
    """Stem-fused ResnetBlock-pair chain (down stage 0 — see section
    docstring above). ``x``: (B,H,W,3) noisy residual; ``wa``/``ba``: the
    3→C stem reflect-conv params; ``wr``/``br``: the 3→C 1×1 residual-conv
    params; the rest as :func:`block_chain3`. Differentiable via the XLA
    reference composition."""
    return _block_chain3_stem_pallas(
        x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond,
        block_rows=block_rows, interpret=interpret,
    )


def _stem_fwd(x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond,
              block_rows, interpret):
    out = block_chain3_stem(
        x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond,
        block_rows, interpret,
    )
    return out, (x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond)


def _stem_bwd(block_rows, interpret, res, g):
    (x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond) = res
    if cond is None:
        _, vjp = jax.vjp(
            lambda *a: block_chain3_stem_reference(*a, None),
            x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd,
        )
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        block_chain3_stem_reference,
        x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond,
    )
    return vjp(g)


block_chain3_stem.defvjp(_stem_fwd, _stem_bwd)


def block_chain3_stem_ds_reference(
    x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond, wds, bds,
    *, dtype=None,
):
    """XLA reference (and custom-VJP backward): stem chain + Downsample."""
    from dgm_img_super_resolution_tpu.models.layers import reflect_conv3x3_stride2

    out = block_chain3_stem_reference(
        x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond, dtype=dtype
    )
    return out, reflect_conv3x3_stride2(out, wds, bds, dtype=dtype or x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def block_chain3_stem_ds(
    x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond, wds, bds,
    block_rows: int = _BLOCK_ROWS, interpret: bool = False,
):
    """Stem-fused chain WITH the down-stage-0 Downsample folded in (round 5
    — the xprof attribution measured the XLA stride-2 conv re-reading the
    chain's 512²×64 output from HBM at 1.13 ms/step plus a 0.41 ms bias
    fusion; in-kernel it reads the out rows from a small VMEM ring instead).
    Returns ``(out, ds_out)`` where ``ds_out = Downsample(out)`` (reflect
    stride-2 conv, ``wds``/``bds``). Other args as :func:`block_chain3_stem`.
    Differentiable via the XLA reference composition."""
    return _block_chain3_stem_pallas(
        x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond, wds, bds,
        block_rows=block_rows, interpret=interpret,
    )


def _stem_ds_fwd(x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond,
                 wds, bds, block_rows, interpret):
    out = block_chain3_stem_ds(
        x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond, wds, bds,
        block_rows, interpret,
    )
    return out, (x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond,
                 wds, bds)


def _stem_ds_bwd(block_rows, interpret, res, g):
    (x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond, wds, bds) = res
    if cond is None:
        _, vjp = jax.vjp(
            lambda x_, wa_, ba_, wr_, br_, tv1_, tv2_, wb_, bb_, wc_, bc_,
            wd_, bd_, wds_, bds_: block_chain3_stem_ds_reference(
                x_, wa_, ba_, wr_, br_, tv1_, tv2_, wb_, bb_, wc_, bc_,
                wd_, bd_, None, wds_, bds_,
            ),
            x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, wds, bds,
        )
        gs = vjp(g)
        return (*gs[:13], None, *gs[13:])
    _, vjp = jax.vjp(
        block_chain3_stem_ds_reference,
        x, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, cond, wds, bds,
    )
    return vjp(g)


block_chain3_stem_ds.defvjp(_stem_ds_fwd, _stem_ds_bwd)


# ---------------------------------------------------------------------------
# Head-fused variant (the last up stage): the virtual-concat head conv
# (3×3, [x‖skip] 2C→C — rb1.block1 over the skip join) and the 1×1
# residual conv (2C→C) move INSIDE the chain call. Round-5 xprof
# attribution of the op-point step measured the XLA head region of up
# stage 2 at ~3.9 ms/step: the conv splits into two per-stream convs
# (0.82 ms each), the res-conv dots (0.56 ms), plus ~1.4 ms of pure
# layout copies and ~1.0 ms of add fusions feeding the chain kernel's
# a_pre/r1 streams at {3,2,1,0} from conv outputs laid out {3,0,2,1}.
# In-kernel the head is 6 K-block passes per stream per row pair —
# (W,2C)@(2C,2C) dots with K already full at C_stream=128, no lane
# concats — and r1 folds into conv_b's epilogue as two (W,C_s)@(C_s,C)
# dots per row; the boundary copies disappear because the kernel reads
# x/skip directly (the layouts XLA already produces them in).
#
# Pipeline = the stem variant's 4-lag structure with two input streams:
# step j assembles x & skip block j (3-slot rolling scratches), conv_a
# computes h1 block j−1, conv_b y1 block j−2 (r1 epilogue reads the lag-2
# x/skip content rows), conv_c h2 block j−3, conv_d the output block j−4.


def _kernel_head(
    x_ref, s_ref, tv1_ref, tv2_ref, wax_ref, was_ref, ba_ref,
    wrx_ref, wrs_ref, br_ref,
    wb_ref, bb_ref, wc_ref, bc_ref, wd_ref, bd_ref,
    o_ref, x_s, s_s, h1_s, y1_s, h2_s,
    *, rows: int, width: int, c: int, cs: int, out_dtype,
):
    nsteps = pl.num_programs(1)  # nb + 4
    nb = nsteps - 4
    j = pl.program_id(1)

    def _col_border(scr, slot, row_lo, row_hi):
        scr[slot, row_lo:row_hi, 0, :] = scr[slot, row_lo:row_hi, 2, :]
        scr[slot, row_lo:row_hi, width + 1, :] = scr[slot, row_lo:row_hi, width - 1, :]

    def _stream_matmul(scratch, slot, w_ref_):
        """Row-pair rowpack passes over one (rows+2, W+2, cs) stream slot:
        two K=cs dots per K-block (no lane concat — cs is a full tile)."""
        accs = []
        for r in range(rows // 2):
            acc = jnp.zeros((width, 2 * c), jnp.float32)
            for p in range(6):
                dx = p // 2
                dy0 = (p % 2) * 2
                base = 2 * r + dy0
                xa = scratch[slot, base, dx : dx + width, :]
                xb = scratch[slot, base + 1, dx : dx + width, :]
                acc = acc + jnp.dot(
                    xa, w_ref_[p, :cs], preferred_element_type=jnp.float32
                )
                acc = acc + jnp.dot(
                    xb, w_ref_[p, cs:], preferred_element_type=jnp.float32
                )
            accs.append(acc)
        return accs

    # ---- stage X: assemble x & skip block j into slot j%3 (active j < nb).
    in_cur = jax.lax.rem(j, 3)
    in_prev = jax.lax.rem(j + 2, 3)  # (j-1) % 3

    @pl.when(j < nb)
    def _assemble():
        for scr, ref in ((x_s, x_ref), (s_s, s_ref)):
            scr[in_cur, 1 : rows + 1, 1 : width + 1, :] = ref[0]

            @pl.when(j > 0)
            def _():
                scr[in_cur, 0, :, :] = scr[in_prev, rows, :, :]

            @pl.when(j == 0)
            def _():
                # image top: row −1 ≡ row 1 = this block's second row.
                scr[in_cur, 0, 1 : width + 1, :] = ref[0, 1]

            _col_border(scr, in_cur, 0, rows + 1)

    # ---- stage A: head conv for block j−1 → h1 (active 1 ≤ j ≤ nb).
    h1_cur = jax.lax.rem(j + 1, 2)  # (j-1) % 2
    h1_prev = 1 - h1_cur

    @pl.when(jnp.logical_and(j >= 1, j <= nb))
    def _conv_a():
        # complete block j−1's bottom halo in both streams.
        @pl.when(j <= nb - 1)
        def _():
            for scr, ref in ((x_s, x_ref), (s_s, s_ref)):
                scr[in_prev, rows + 1, 1 : width + 1, :] = ref[0, 0]
                scr[in_prev, rows + 1, 0, :] = ref[0, 0, 1, :]
                scr[in_prev, rows + 1, width + 1, :] = ref[0, 0, width - 2, :]

        @pl.when(j == nb)
        def _():
            for scr in (x_s, s_s):
                scr[in_prev, rows + 1, :, :] = scr[in_prev, rows - 1, :, :]

        ba2 = jnp.concatenate([ba_ref[0], ba_ref[0]]).astype(jnp.float32)
        tv1 = tv1_ref[0, 0].astype(jnp.float32)
        tv1cat = jnp.concatenate([tv1, tv1])
        accs_x = _stream_matmul(x_s, in_prev, wax_ref)
        accs_s = _stream_matmul(s_s, in_prev, was_ref)
        for r in range(rows // 2):
            acc = accs_x[r] + accs_s[r]
            h = (_mish_f32(acc + ba2) + tv1cat).astype(h1_s.dtype)
            h1_s[h1_cur, 1 + 2 * r, 1 : width + 1, :] = h[:, :c]
            h1_s[h1_cur, 2 + 2 * r, 1 : width + 1, :] = h[:, c:]
        @pl.when(j > 1)
        def _():
            h1_s[h1_cur, 0, :, :] = h1_s[h1_prev, rows, :, :]

        @pl.when(j == 1)
        def _():
            h1_s[h1_cur, 0, 1 : width + 1, :] = h1_s[h1_cur, 2, 1 : width + 1, :]

        _col_border(h1_s, h1_cur, 0, rows + 1)

    # ---- stage B: conv_b for h1 block j−2 → y1 (active 2 ≤ j ≤ nb+1).
    @pl.when(jnp.logical_and(j >= 2, j <= nb + 1))
    def _conv_b():
        h1_rd = jax.lax.rem(j, 2)  # (j-2) % 2
        @pl.when(j <= nb)
        def _():
            h1_s[h1_rd, rows + 1, :, :] = h1_s[1 - h1_rd, 1, :, :]

        @pl.when(j == nb + 1)
        def _():
            h1_s[h1_rd, rows + 1, :, :] = h1_s[h1_rd, rows - 1, :, :]

        y1_slot = jax.lax.rem(j - 2, 3)
        in_rd = jax.lax.rem(j + 1, 3)  # (j-2) % 3: r1's input rows
        bias2 = jnp.concatenate([bb_ref[0], bb_ref[0]]).astype(jnp.float32)
        br2 = jnp.concatenate([br_ref[0], br_ref[0]]).astype(jnp.float32)
        accs = _rowpack_matmul(h1_s, h1_rd, wb_ref, rows, width, c)
        for r, acc in enumerate(accs):
            r1_rows = []
            for row in (1 + 2 * r, 2 + 2 * r):
                xa = x_s[in_rd, row, 1 : width + 1, :]
                sa = s_s[in_rd, row, 1 : width + 1, :]
                r1_rows.append(
                    jnp.dot(xa, wrx_ref[0], preferred_element_type=jnp.float32)
                    + jnp.dot(sa, wrs_ref[0], preferred_element_type=jnp.float32)
                )
            r1cat = jnp.concatenate(r1_rows, axis=-1) + br2
            y = (_mish_f32(acc + bias2) + r1cat).astype(y1_s.dtype)
            y1_s[y1_slot, 1 + 2 * r, 1 : width + 1, :] = y[:, :c]
            y1_s[y1_slot, 2 + 2 * r, 1 : width + 1, :] = y[:, c:]
        @pl.when(j > 2)
        def _():
            y1_s[y1_slot, 0, :, :] = y1_s[jax.lax.rem(j - 3, 3), rows, :, :]

        @pl.when(j == 2)
        def _():
            y1_s[y1_slot, 0, 1 : width + 1, :] = y1_s[y1_slot, 2, 1 : width + 1, :]

        _col_border(y1_s, y1_slot, 0, rows + 1)
        @pl.when(j > 2)
        def _():
            y1_s[jax.lax.rem(j - 3, 3), rows + 1, :, :] = y1_s[y1_slot, 1, :, :]

    @pl.when(j == nb + 2)
    def _y1_last_halo():
        s = jax.lax.rem(nb - 1, 3)
        y1_s[s, rows + 1, :, :] = y1_s[s, rows - 1, :, :]

    # ---- stage C: conv_c for y1 block j−3 → h2 (active 3 ≤ j ≤ nb+2).
    @pl.when(jnp.logical_and(j >= 3, j <= nb + 2))
    def _conv_c():
        h2_slot = jax.lax.rem(j + 1, 2)  # (j-3) % 2
        y1_rd = jax.lax.rem(j, 3)  # (j-3) % 3
        bias2 = jnp.concatenate([bc_ref[0], bc_ref[0]]).astype(jnp.float32)
        tv2 = tv2_ref[0, 0].astype(jnp.float32)
        tv2cat = jnp.concatenate([tv2, tv2])
        accs = _rowpack_matmul(y1_s, y1_rd, wc_ref, rows, width, c)
        for r, acc in enumerate(accs):
            h = (_mish_f32(acc + bias2) + tv2cat).astype(h2_s.dtype)
            h2_s[h2_slot, 1 + 2 * r, 1 : width + 1, :] = h[:, :c]
            h2_s[h2_slot, 2 + 2 * r, 1 : width + 1, :] = h[:, c:]
        @pl.when(j > 3)
        def _():
            h2_s[h2_slot, 0, :, :] = h2_s[1 - h2_slot, rows, :, :]

        @pl.when(j == 3)
        def _():
            h2_s[h2_slot, 0, 1 : width + 1, :] = h2_s[h2_slot, 2, 1 : width + 1, :]

        _col_border(h2_s, h2_slot, 0, rows + 1)
        @pl.when(j > 3)
        def _():
            h2_s[1 - h2_slot, rows + 1, :, :] = h2_s[h2_slot, 1, :, :]

    @pl.when(j == nb + 3)
    def _h2_last_halo():
        s = jax.lax.rem(nb - 1, 2)
        h2_s[s, rows + 1, :, :] = h2_s[s, rows - 1, :, :]

    # ---- stage D: conv_d for h2 block j−4 → out (active j ≥ 4).
    @pl.when(j >= 4)
    def _conv_d():
        h2_rd = jax.lax.rem(j, 2)  # (j-4) % 2
        y1_rd = jax.lax.rem(j + 2, 3)  # (j-4) % 3
        bias2 = jnp.concatenate([bd_ref[0], bd_ref[0]]).astype(jnp.float32)
        accs = _rowpack_matmul(h2_s, h2_rd, wd_ref, rows, width, c)
        for r, acc in enumerate(accs):
            ya = y1_s[y1_rd, 1 + 2 * r, 1 : width + 1, :]
            yb = y1_s[y1_rd, 2 + 2 * r, 1 : width + 1, :]
            ycat = jnp.concatenate([ya, yb], axis=-1).astype(jnp.float32)
            out = (_mish_f32(acc + bias2) + ycat).astype(out_dtype)
            o_ref[0, 2 * r, :, :] = out[:, :c]
            o_ref[0, 2 * r + 1, :, :] = out[:, c:]


def block_chain3_head_reference(
    x, skip, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd, *, dtype=None
):
    """XLA reference composition (also the custom-VJP backward path): the
    virtual-concat head conv + 1×1 residual conv + the 3-conv chain."""
    from dgm_img_super_resolution_tpu.models.layers import reflect_conv3x3

    dtype = dtype or x.dtype
    cx = x.shape[-1]
    a_pre = reflect_conv3x3(x, wa[:, :, :cx], ba, dtype=dtype) + reflect_conv3x3(
        skip, wa[:, :, cx:], None, dtype=dtype
    )
    r1 = (
        jnp.einsum("bhwc,cd->bhwd", x.astype(dtype), wr[:cx].astype(dtype))
        + jnp.einsum("bhwc,cd->bhwd", skip.astype(dtype), wr[cx:].astype(dtype))
        + br.astype(dtype)
    )
    return block_chain3_reference(
        a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, None, dtype=dtype
    )


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _block_chain3_head_pallas(
    x, skip, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd,
    *, block_rows: int = _BLOCK_ROWS, interpret: bool = False,
):
    b, h, w, cs = x.shape
    assert skip.shape == x.shape, (skip.shape, x.shape)
    c = wa.shape[-1]
    assert wa.shape == (3, 3, 2 * cs, c), wa.shape
    assert wr.shape == (2 * cs, c), wr.shape
    for k in (wb, wc, wd):
        assert k.shape == (3, 3, c, c), k.shape
    assert c == 64, c  # rowpack mode only (2c fills the 128 lanes)
    assert h % block_rows == 0 and block_rows % 2 == 0, (h, block_rows)
    dtype = x.dtype
    nb = h // block_rows

    wax_p = pack_weights(wa[:, :, :cs].astype(jnp.float32)).astype(dtype)
    was_p = pack_weights(wa[:, :, cs:].astype(jnp.float32)).astype(dtype)
    wbcd_p = [pack_weights(k.astype(jnp.float32)).astype(dtype) for k in (wb, wc, wd)]
    biases = [v.astype(jnp.float32).reshape(1, c) for v in (ba, br, bb, bc, bd)]
    wrx_p = wr[:cs].astype(dtype).reshape(1, cs, c)
    wrs_p = wr[cs:].astype(dtype).reshape(1, cs, c)
    tvs = [v.astype(jnp.float32).reshape(b, 1, c) for v in (tv1, tv2)]

    kern = functools.partial(
        _kernel_head, rows=block_rows, width=w, c=c, cs=cs, out_dtype=dtype,
    )

    def stream(off, ch):
        return pl.BlockSpec(
            (1, block_rows, w, ch),
            lambda i, j, off=off: (i, jnp.clip(j - off, 0, nb - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    vec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        stream(0, cs), stream(0, cs),  # x, skip
        vec, vec,                      # tv1, tv2
        full, full, full,              # wa x/skip packs, ba
        full, full, full,              # wr x/skip, br
        full, full, full, full, full, full,  # wb/bb, wc/bc, wd/bd
    ]
    inputs = [x, skip, tvs[0], tvs[1], wax_p, was_p, biases[0],
              wrx_p, wrs_p, biases[1],
              wbcd_p[0], biases[2], wbcd_p[1], biases[3], wbcd_p[2], biases[4]]

    return pl.pallas_call(
        kern,
        grid=(b, nb + 4),
        in_specs=in_specs,
        out_specs=stream(4, c),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, block_rows + 2, w + 2, cs), dtype),  # x
            pltpu.VMEM((3, block_rows + 2, w + 2, cs), dtype),  # skip
            pltpu.VMEM((2, block_rows + 2, w + 2, c), dtype),   # h1
            pltpu.VMEM((3, block_rows + 2, w + 2, c), dtype),   # y1
            pltpu.VMEM((2, block_rows + 2, w + 2, c), dtype),   # h2
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * (2 * 12 * cs * 2 * c + 3 * 12 * c * 2 * c
                                   + 2 * cs * c),
            bytes_accessed=b * h * w * (2 * cs + c) * dtype.itemsize,
            transcendentals=4 * b * h * w * c,
        ),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15))
def block_chain3_head(
    x, skip, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd,
    block_rows: int = _BLOCK_ROWS, interpret: bool = False,
):
    """Head-fused ResnetBlock-pair chain (the last up stage — see section
    docstring above). ``x``/``skip``: (B,H,W,C_s) post-upsample activation
    and the down-path skip (the virtual concat pair); ``wa``/``ba``: the
    2C_s→C head reflect-conv params; ``wr``/``br``: the 2C_s→C 1×1
    residual-conv params; the rest as :func:`block_chain3`. Differentiable
    via the XLA reference composition."""
    return _block_chain3_head_pallas(
        x, skip, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd,
        block_rows=block_rows, interpret=interpret,
    )


def _head_fwd(x, skip, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd,
              block_rows, interpret):
    out = block_chain3_head(
        x, skip, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd,
        block_rows, interpret,
    )
    return out, (x, skip, wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd)


def _head_bwd(block_rows, interpret, res, g):
    _, vjp = jax.vjp(lambda *a: block_chain3_head_reference(*a), *res)
    return vjp(g)


block_chain3_head.defvjp(_head_fwd, _head_bwd)
