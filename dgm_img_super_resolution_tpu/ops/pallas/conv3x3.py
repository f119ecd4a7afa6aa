"""Row-pair-packed 3×3 conv Pallas kernel for narrow-channel stages.

Why this kernel exists: the SRDiff UNet's hottest convs run at 512² with only
64 channels (reference topology, ``srdiff/model.py:752-801``). XLA's conv
emitter reaches just ~39 TFLOP/s on v5e for that shape (measured,
``tools/perf_microbench.py``) because the output channel dim fills only half
of the MXU's 128 lanes; the wider stages (128/192/256 ch) reach 91–185
TFLOP/s. This kernel restores full-lane MXU work by computing **two
vertically adjacent output rows per matmul**:

- output block = (W, 2·C) — row-pair channels side by side → N = 128 lanes
  full when C = 64;
- contraction = the 12 (dy ∈ 0..3, dx ∈ 0..2) input taps a row pair needs,
  lane-concatenated pairwise into 6 K=2C blocks → 6 accumulated
  (W,2C)@(2C,2C) MXU matmuls per row pair;
- the packed weight carries w[dy,dx] for the top output row (dy<3) and
  w[dy-1,dx] for the bottom (dy≥1), zeros elsewhere — 12·C·2C padded vs
  9·C·2C useful contraction = 1.33× padded FLOPs at ~1.8× the achieved rate.

**Halo delivery — the lag pipeline.** Each output row block needs one input
row above and below it. Every standard delivery mechanism measured worse
than the kernel's win: extra BlockSpecs over the same array make XLA
materialise full input copies around the custom call; manual DMA from HBM
is rejected by Mosaic for C=64 (lane-unaligned slices); pre-gathering halos
in XLA costs ~0.8 ms (gather or strided-slice + stack). Instead this kernel
exploits the TPU grid's *sequential* execution: grid step j receives input
block j but computes **output block j−1** from a persistent VMEM scratch
filled on the previous step — at which point the future row (block j's
first, the bottom halo of block j−1) is sitting in x_ref. Two scratch slots
alternate by step parity: compute reads slot (j−1)%2, assembled last step;
this step assembles slot j%2 from x_ref (+ its top halo = the previous
slot's last content row). The grid gets one extra step per batch image, and
output block 0 is written twice (garbage at step 0, sequentially overwritten
at step 1) — both negligible. Net extra HBM traffic: zero.

``border`` selects the edge semantics assembled into the scratch:
``"reflect"`` = torch ``ReflectionPad2d(1)`` (reference ``Block``,
``model.py:439-457``) — border cols mirror col 1 / W−2, edge halo rows
mirror row 1 / H−2; ``"zero"`` = plain zero-padded SAME. The *entire*
reflect conv is one fused op — no correction pass.

Optional fused epilogue: bias and Mish (conv→Mish is the reference
``Block``), saving a full HBM round-trip of the activation at 512².

Rejected alternatives (all measured slower on v5e at (8,512,512,64) bf16,
tools/conv_rowpack_bench.py; XLA conv baseline 3.95 ms): 3-BlockSpec halos
2.98 ms standalone but 3 full input copies in context; XLA-gathered halos
3.75 ms; output-side dx shifts as N=6C matmul blocks 3.28 ms; value-level
pad shifts 3.46 ms; whole-block patch matrix + single matmul 4.10 ms;
HBM-materialised 2-pixel lane packing via XLA 35 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output rows per grid step (must be even; 2 output rows per matmul).
_BLOCK_ROWS = 16


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def pack_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) HWIO kernel → (6, 2Cin, 2Cout) packed K-block weights.

    K-block p = 2·dx + (dy_pair//2), dx ∈ 0..2, dy_pair ∈ {0, 2}: the pair of
    row taps (dy_pair, dy_pair+1) at column offset dx. Within a block,
    K-lanes [0:Cin] ↔ tap dy_pair, [Cin:2Cin] ↔ tap dy_pair+1; output lanes
    [0:Cout] = top output row (uses w[dy, dx]), [Cout:2Cout] = bottom output
    row (uses w[dy-1, dx]); zeros where a tap is outside the 3×3 window.
    """
    zero = jnp.zeros((kernel.shape[2], kernel.shape[3]), kernel.dtype)
    blocks = []
    for dx in range(3):
        for dy_pair in (0, 2):
            rows = []
            for dy in (dy_pair, dy_pair + 1):
                top = kernel[dy, dx] if dy < 3 else zero
                bot = kernel[dy - 1, dx] if dy >= 1 else zero
                rows.append(jnp.concatenate([top, bot], axis=-1))  # (C, 2C)
            blocks.append(jnp.concatenate(rows, axis=0))  # (2C, 2C)
    return jnp.stack(blocks)  # (6, 2C, 2C)


def _kernel(x_ref, w_ref, b_ref, o_ref, scratch, *,
            rows: int, width: int, c: int, mish: bool, border: str, out_dtype):
    # Grid: (batch, nb + 1). Step j: assemble scratch slot j%2 from input
    # block min(j, nb-1); compute output block j-1 from slot (j-1)%2.
    nsteps = pl.num_programs(1)  # nb + 1
    j = pl.program_id(1)
    cur = jax.lax.rem(j, 2)
    prev = 1 - cur

    # ---- assemble current slot: rows 1..rows hold the input block; row 0 is
    # its top halo = previous slot's last content row (or the reflection /
    # zero at the image top); row rows+1 (bottom halo) is written next step.
    @pl.when(j < nsteps - 1)
    def _assemble():
        scratch[cur, 1 : rows + 1, 1 : width + 1, :] = x_ref[0]
        # top halo for block j: block j-1's last row, sitting in prev slot.
        @pl.when(j > 0)
        def _():
            scratch[cur, 0, :, :] = scratch[prev, rows, :, :]

        @pl.when(j == 0)
        def _():
            if border == "reflect":
                # row −1 ≡ row 1 = this block's second row.
                scratch[cur, 0, 1 : width + 1, :] = x_ref[0, 1]
            else:
                scratch[cur, 0, :, :] = jnp.zeros((width + 2, c), scratch.dtype)
        # column border for the newly written rows (halo row included; its
        # corners become the double reflection, e.g. orig (−1,−1) ≡ x[1,1]).
        if border == "reflect":
            scratch[cur, 0 : rows + 1, 0, :] = scratch[cur, 0 : rows + 1, 2, :]
            scratch[cur, 0 : rows + 1, width + 1, :] = scratch[
                cur, 0 : rows + 1, width - 1, :
            ]
        else:
            scratch[cur, 0 : rows + 1, 0, :] = jnp.zeros((rows + 1, c), scratch.dtype)
            scratch[cur, 0 : rows + 1, width + 1, :] = jnp.zeros(
                (rows + 1, c), scratch.dtype
            )

    # ---- complete the previous slot's bottom halo and compute from it.
    @pl.when(j > 0)
    def _compute():
        @pl.when(j < nsteps - 1)
        def _():
            # bottom halo of block j-1 = block j's first row (+ col border).
            scratch[prev, rows + 1, 1 : width + 1, :] = x_ref[0, 0]
            if border == "reflect":
                scratch[prev, rows + 1, 0, :] = scratch[prev, rows + 1, 2, :]
                scratch[prev, rows + 1, width + 1, :] = scratch[
                    prev, rows + 1, width - 1, :
                ]
            else:
                scratch[prev, rows + 1, 0, :] = jnp.zeros((c,), scratch.dtype)
                scratch[prev, rows + 1, width + 1, :] = jnp.zeros(
                    (c,), scratch.dtype
                )

        @pl.when(j == nsteps - 1)
        def _():
            # image bottom: row H ≡ row H−2 (local rows−1) or zeros.
            scratch[prev, rows + 1, :, :] = (
                scratch[prev, rows - 1, :, :]
                if border == "reflect"
                else jnp.zeros((width + 2, c), scratch.dtype)
            )

        bias2 = jnp.concatenate([b_ref[0], b_ref[0]]).astype(jnp.float32)
        for r in range(rows // 2):
            acc = jnp.zeros((width, 2 * c), jnp.float32)
            for p in range(6):
                dx = p // 2
                dy0 = (p % 2) * 2
                base = 2 * r + dy0  # slot row of the pair's first tap
                xa = scratch[prev, base, dx : dx + width, :]
                xb = scratch[prev, base + 1, dx : dx + width, :]
                xcat = jnp.concatenate([xa, xb], axis=-1)  # (W, 2C)
                acc = acc + jnp.dot(
                    xcat, w_ref[p], preferred_element_type=jnp.float32
                )
            acc = acc + bias2
            if mish:
                acc = _mish(acc)
            acc = acc.astype(out_dtype)
            o_ref[0, 2 * r, :, :] = acc[:, :c]
            o_ref[0, 2 * r + 1, :, :] = acc[:, c:]

    # step 0 still writes output block 0 (whatever the buffer holds); step 1
    # sequentially overwrites it with the real values.


@functools.partial(
    jax.jit, static_argnames=("mish", "border", "block_rows", "interpret")
)
def conv3x3_rowpack(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    mish: bool = False,
    border: str = "zero",
    block_rows: int = _BLOCK_ROWS,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME 3×3 conv (+bias, optional fused Mish) with ``border`` ∈
    {"zero", "reflect"} padding via the row-pair-packed MXU kernel.
    ``x``: (B,H,W,C); ``kernel``: (3,3,C,C) HWIO; requires
    H % block_rows == 0 and (for reflect) block_rows ≥ 2.
    """
    b, h, w, c = x.shape
    assert kernel.shape == (3, 3, c, c), kernel.shape
    assert h % block_rows == 0 and block_rows % 2 == 0, (h, block_rows)
    assert border in ("zero", "reflect"), border
    dtype = x.dtype
    wp = pack_weights(kernel.astype(jnp.float32)).astype(dtype)
    bias = bias.astype(jnp.float32)
    nb = h // block_rows

    kern = functools.partial(
        _kernel, rows=block_rows, width=w, c=c, mish=mish, border=border,
        out_dtype=dtype,
    )
    return pl.pallas_call(
        kern,
        grid=(b, nb + 1),
        in_specs=[
            pl.BlockSpec(
                (1, block_rows, w, c),
                lambda i, j: (i, jnp.minimum(j, nb - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed weights (6,2C,2C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, C)
        ],
        out_specs=pl.BlockSpec(
            (1, block_rows, w, c),
            lambda i, j: (i, jnp.maximum(j - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dtype),
        scratch_shapes=[pltpu.VMEM((2, block_rows + 2, w + 2, c), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 12 * c * 2 * c,
            bytes_accessed=2 * (2 * b * h * w * c) * x.dtype.itemsize,
            transcendentals=b * h * w * c if mish else 0,
        ),
        interpret=interpret,
    )(x, wp, bias.reshape(1, c))
