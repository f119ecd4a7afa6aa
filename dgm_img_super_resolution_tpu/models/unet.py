"""SRDiff conditional noise-prediction UNet (NHWC Flax).

Capability twin of the reference UNet (``srdiff/model.py:752-847``), with the
exact topology required for upstream-weight parity:

- dims ladder ``[3, dim·m for m in dim_mults]`` with dim=64, mults (1,2,3,4);
- 4 down stages (2×ResnetBlock + Downsample except last); RRDB condition
  (and optional LR-upsample projection) added after down stage 0 only;
- mid block1 / optional linear-attention / block2;
- 3 up stages with skip-concat (the reference pops only 3 of 4 saved skips —
  topology preserved for weight import);
- final reflect-pad Block + 1×1 conv.

The condition is the channel-concat of every 3rd RRDB feature
(``cond[2::3]``, reference ``model.py:825``) projected to HR resolution by a
ConvTranspose(k=2·scale, s=scale, p=scale/2). Callers concatenate the
features once, outside the sampling scan.

TPU notes: groups=0 (no norm) keeps every stage a pure conv+Mish chain that
XLA fuses; time embedding is two small Dense layers per step. The whole
forward is shape-static so the 100-step sampler scans over it.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dgm_img_super_resolution_tpu.models.layers import (
    Block,
    Conv1x1Pair,
    ConvTranspose2dTorch,
    Downsample,
    LinearAttention,
    ResnetBlock,
    Upsample,
    mish,
    reflect_pad,
    sinusoidal_pos_emb,
)

Dtype = Any


class Unet(nn.Module):
    dim: int = 64
    out_dim: int = 3
    dim_mults: Sequence[int] = (1, 2, 3, 4)
    cond_dim: int = 32
    rrdb_num_block: int = 8
    sr_scale: int = 4
    use_attn: bool = False
    res: bool = True
    up_input: bool = False
    groups: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time, cond, img_lr_up=None, *, cond_projected=False,
                 up_folded=False, project_only=False, mode="full", enc_feats=None,
                 pad_out=None):
        """x: (N,H,W,3) noisy residual; time: (N,); cond: (N,H/s,W/s,C_cond)
        channel-concat of the selected RRDB features; img_lr_up: (N,H,W,3).

        ``project_only=True`` returns just the HR-projected condition so the
        sampler can hoist the projection out of the T-step scan (it depends
        on neither x nor t); pass that result back with ``cond_projected=True``.
        When the hoist was given ``img_lr_up`` it also folds the up-projection
        term into the result — per-step callers must then acknowledge with
        ``up_folded=True``; a hoist *without* ``img_lr_up`` keeps the per-step
        ``up_proj`` add alive (pre-hoist behaviour), so no combination
        silently drops the term (ADVICE r2 #3).

        ``mode`` splits the forward at the bottleneck for encoder
        propagation (training-free sampler acceleration: the down path is
        ~58% of forward FLOPs and drifts slowly across adjacent timesteps —
        "Faster Diffusion", arXiv 2312.09608):

        - ``"encode"`` → runs the down path only, returns ``(skips, x)``;
        - ``"decode"`` → takes ``enc_feats=(skips, x)`` and runs
          mid/up/final only (``x``/``cond``/``img_lr_up`` may be None);
        - ``"full"`` (default) → both, identical to encode∘decode.
        """
        dims = [3] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        # Lane-padded sampler carry (diffusion/gaussian.py pad_carry_lanes):
        # the sampler may hand x over with one extra all-zero channel so no
        # C=3-minor tensor exists inside the T-step scan (the profiled cost
        # of the C=3 layout round-trip was ~18% of the step — convert at
        # 14 GiB/s, standalone pad, two f32 relayout copies). The padded x
        # feeds the stem-fused chain kernel directly (which zero-pads the
        # weights' input dim to match); every other consumer reads the true
        # lanes via x_true; the final conv mirrors the padding on its output
        # (pad_out) so ε and x stay lane-aligned for the carry update.
        x_true = x
        if mode != "decode" and not project_only and x is not None:
            x_lanes = x.shape[-1]
            if x_lanes == dims[0] + 1:
                x_true = x[..., : dims[0]]
                if pad_out is None:
                    pad_out = self.out_dim == dims[0]
        pad_out = bool(pad_out)

        if mode != "decode":
            if cond_projected:
                cond_proj = cond.astype(self.dtype)
            else:
                cond_proj = ConvTranspose2dTorch(
                    self.dim, self.sr_scale * 2, self.sr_scale, self.sr_scale // 2,
                    dtype=self.dtype, name="cond_proj",
                )(cond)
            if project_only:
                # Fold the up-projection of img_lr_up in as well when given:
                # like cond_proj it depends on neither x nor t (img_lr_up is
                # scan-invariant), and the two are added at the same point
                # (after down stage 0), so hoisting their SUM removes a
                # lane-starved 3→dim conv at full resolution from every
                # sampler step (~3.5 ms/step measured at 512²/B=8 — the
                # worst-MFU op in the UNet). Callers that hoist with
                # img_lr_up must then pass cond_projected=True per step.
                if self.res and self.up_input and img_lr_up is not None:
                    cond_proj = cond_proj + nn.Conv(
                        self.dim, (3, 3), padding="VALID", dtype=self.dtype,
                        name="up_proj",
                    )(reflect_pad(img_lr_up, 1))
                return cond_proj

        t = sinusoidal_pos_emb(time, self.dim).astype(self.dtype)
        t = nn.Dense(self.dim * 4, dtype=self.dtype, name="mlp_0")(t)
        t = nn.Dense(self.dim, dtype=self.dtype, name="mlp_1")(mish(t))

        # Fused 512²/256² C=64 serving path (ops/pallas/block_chain.py): the
        # whole ResnetBlock-pair chain of down stage 0 / the last up stage —
        # three 64→64 reflect convs + every elementwise epilogue — runs as ONE
        # Pallas call, so the round-1 rowpack lesson (custom-call boundaries
        # cost XLA its cross-op fusion per Block) is amortised over the region.
        def fused_pair(rb1, rb2, x, skip=None, cond=None, ds_mod=None):
            from dgm_img_super_resolution_tpu.models import layers as _l
            from dgm_img_super_resolution_tpu.ops.pallas.block_chain import (
                block_chain3,
                block_chain3_stem,
                chain_block_rows,
            )

            _BC_ROWS = chain_block_rows(x.shape[1])

            dim_out = rb1.dim_out
            if (
                skip is not None
                and x.shape == skip.shape
                and _l.chain_head_enabled(x.shape[-1], dim_out)
            ):
                # Head-fused variant (the last up stage): the virtual-concat
                # head conv and the 1×1 residual conv run inside the chain
                # call, reading x/skip directly — removes the two split XLA
                # head convs, the res-conv dots, and ~1.4 ms/step of layout
                # copies at the kernel boundary (round-5 profile;
                # docs/DESIGN.md "Head-fused chain").
                from dgm_img_super_resolution_tpu.ops.pallas.block_chain import (
                    block_chain3_head,
                )

                tv1, wa, ba, wr, br, wb, bb = rb1(
                    x, t, skip=skip, parts="head_stem"
                )
                tv2, wc, bc, wd, bd = rb2(None, t, parts="tail")
                return block_chain3_head(
                    x.astype(self.dtype), skip.astype(self.dtype),
                    wa, ba, wr, br, tv1, tv2, wb, bb, wc, bc, wd, bd,
                    _BC_ROWS, _l.CHAIN_INTERPRET,
                )
            if (
                x.shape[-1] <= 4 and skip is None and _l.chain_stem_enabled()
                and dim_out == 64
            ):
                # dim_out == 64 guard: the stem kernel has only the row-pair-
                # packed matmul mode, which Mosaic rejects at C≥128 ("Input
                # offsets outside of the first tile") — a non-default dim
                # combined with DGMSR_CHAIN_C would otherwise route here and
                # fail to compile (ADVICE r3 low #1). Other widths fall
                # through to the non-stem head path, which has the unpacked
                # C≥128 mode.
                # Stem-fused variant (down stage 0): the lane-starved 3→dim
                # stem conv (~2 TFLOP/s standalone, docs/DESIGN.md "Thin-stem
                # conv study") and the 3→dim 1×1 residual conv move inside
                # the kernel — their outputs never round-trip HBM. A lane-
                # padded x flows in unsliced (the kernel zero-pads the
                # weights instead); only the param shapes read true lanes.
                x_params = x[..., : dims[0]] if x.shape[-1] > dims[0] else x
                tv1, wa, ba, wr, br, wb, bb = rb1(x_params, t, parts="head_stem")
                tv2, wc, bc, wd, bd = rb2(None, t, parts="tail")
                # The kernel derives its VMEM scratch dtype from x: cast to
                # the compute dtype HERE (the non-stem path gets this for
                # free because a_pre/r1 come out of XLA Blocks at
                # self.dtype) — an f32 x from the sampler scan would
                # otherwise double the rolling-slot footprint and blow the
                # 16 MB scoped-vmem limit at 512².
                if ds_mod is not None:
                    # fold the Downsample's stride-2 reflect conv into the
                    # same call — the chain output feeds it from a VMEM
                    # ring instead of an HBM round-trip (docs/DESIGN.md
                    # "Downsample fold"). Returns (out, ds_out).
                    from dgm_img_super_resolution_tpu.ops.pallas.block_chain import (
                        block_chain3_stem_ds,
                    )

                    wds, bds = ds_mod(None, weights_only=True, c_in=rb1.dim_out)
                    return block_chain3_stem_ds(
                        x.astype(self.dtype), wa, ba, wr, br, tv1, tv2, wb,
                        bb, wc, bc, wd, bd, cond, wds, bds,
                        _BC_ROWS, _l.CHAIN_INTERPRET,
                    )
                return block_chain3_stem(
                    x.astype(self.dtype), wa, ba, wr, br, tv1, tv2, wb, bb,
                    wc, bc, wd, bd, cond, _BC_ROWS, _l.CHAIN_INTERPRET,
                )
            if x.shape[-1] == dims[0] + 1:
                x = x[..., : dims[0]]  # non-stem paths read the true lanes
            a_pre, tv1, r1, wb, bb = rb1(x, t, skip=skip, parts="head")
            tv2, wc, bc, wd, bd = rb2(None, t, parts="tail")
            return block_chain3(
                a_pre, r1, tv1, tv2, wb, bb, wc, bc, wd, bd, cond,
                _BC_ROWS, _l.CHAIN_INTERPRET,
            )

        def chain_ok(x, dim_out):
            from dgm_img_super_resolution_tpu.models.layers import chain_eligible

            return (
                not self.is_initializing()
                and self.groups == 0
                and chain_eligible(x.shape[1], x.shape[2], dim_out)
            )

        if mode == "decode":
            h = list(enc_feats[0])
            x = enc_feats[1]
        else:
            h = []
            for i, (_, dim_out) in enumerate(in_out):
                is_last = i >= num_res - 1
                rb1 = ResnetBlock(dim_out, self.dim, self.groups, self.dtype, name=f"down_{i}_res1")
                rb2 = ResnetBlock(dim_out, self.dim, self.groups, self.dtype, name=f"down_{i}_res2")
                x_ds = None
                if chain_ok(x, dim_out):
                    from dgm_img_super_resolution_tpu.models import layers as _l

                    ds_mod = None
                    if (
                        i == 0
                        and not is_last
                        and x.shape[-1] <= 4
                        and _l.chain_ds_enabled()
                        and _l.chain_stem_enabled()
                        and dim_out == 64
                        and x.shape[1] % 2 == 0
                        and x.shape[2] % 2 == 0
                        and not (self.res and self.up_input and not up_folded)
                    ):
                        # the Downsample folds into the stem chain call;
                        # the per-stage XLA Downsample below is then skipped
                        # (the module is instantiated ONCE either way, so
                        # param names/shapes are unchanged).
                        ds_mod = Downsample(
                            self.dtype, name=f"down_{i}_downsample"
                        )
                    res = fused_pair(
                        rb1, rb2, x, cond=cond_proj if i == 0 else None,
                        ds_mod=ds_mod,
                    )
                    x, x_ds = res if isinstance(res, tuple) else (res, None)
                else:
                    x = rb1(x_true if i == 0 else x, t)
                    x = rb2(x, t)
                    if i == 0:
                        x = x + cond_proj
                # up_folded=True means up_proj is folded into cond by the
                # project_only hoist above — do not add it again. A caller
                # that hoisted WITHOUT img_lr_up still gets the per-step add
                # here; passing neither is a loud error, never a silent drop.
                if i == 0 and self.res and self.up_input and not up_folded:
                    if img_lr_up is None:
                        raise ValueError(
                            "Unet: res+up_input needs img_lr_up per step, or a "
                            "project_only hoist that folded it (then pass "
                            "up_folded=True)"
                        )
                    up_proj = nn.Conv(
                        self.dim, (3, 3), padding="VALID", dtype=self.dtype, name="up_proj"
                    )(reflect_pad(img_lr_up, 1))
                    x = x + up_proj
                h.append(x)
                if not is_last:
                    x = (
                        x_ds
                        if x_ds is not None
                        else Downsample(self.dtype, name=f"down_{i}_downsample")(x)
                    )
            if mode == "encode":
                return tuple(h), x

        mb1 = ResnetBlock(dims[-1], self.dim, self.groups, self.dtype, name="mid_block1")
        mb2 = ResnetBlock(dims[-1], self.dim, self.groups, self.dtype, name="mid_block2")
        if not self.use_attn and chain_ok(x, dims[-1]):
            # mid_block1/mid_block2 are a plain ResnetBlock pair when the
            # attention gate is off (the SRDiff config) — same fused region.
            x = fused_pair(mb1, mb2, x)
        else:
            x = mb1(x, t)
            if self.use_attn:
                # Residual(Rezero(LinearAttention)) with the gate inlined:
                # g initialises to 0 so the attention branch starts disabled.
                g = self.param("mid_attn_g", nn.initializers.zeros, (1,))
                x = x + LinearAttention(dtype=self.dtype, name="mid_attn")(x) * g
            x = mb2(x, t)

        # up stages mirror reversed(in_out[1:]) — 3 stages, all with Upsample
        # (the reference's is_last condition never triggers there). The skip
        # join is a *virtual* concat: res1's convs read (x, skip) as a pair,
        # saving a full-width concat buffer round-trip per stage in the
        # T-step sampling scan (see layers.ResnetBlock).
        n_up = len(in_out) - 1
        for i, (dim_in, _) in enumerate(reversed(in_out[1:])):
            rb1 = ResnetBlock(dim_in, self.dim, self.groups, self.dtype, name=f"up_{i}_res1")
            rb2 = ResnetBlock(dim_in, self.dim, self.groups, self.dtype, name=f"up_{i}_res2")
            if chain_ok(x, dim_in):
                x = fused_pair(rb1, rb2, x, skip=h.pop())
            else:
                x = rb1(x, t, skip=h.pop())
                x = rb2(x, t)
            if i == n_up - 1:
                # Fused UNet tail (ops/pallas/tail_fuse.py): the last
                # Upsample's ConvTranspose, the final Block's reflect
                # conv+Mish, and the final 1×1 run as ONE Pallas call —
                # the round-5 profile measured the XLA composition at
                # ~5.9 ms/step of layout/HBM-bound ops because both
                # (B,2H,2W,64) intermediates round-trip HBM in awkward
                # layouts (docs/DESIGN.md "Fused tail kernel").
                from dgm_img_super_resolution_tpu.models import layers as _l

                if (
                    not self.is_initializing()
                    and self.groups == 0
                    and _l.tail_eligible(x.shape[1], x.shape[2], dim_in)
                ):
                    from dgm_img_super_resolution_tpu.ops.pallas.tail_fuse import (
                        tail_fuse,
                    )

                    kt, bt = Upsample(self.dtype, name=f"up_{i}_upsample")(
                        None, weights_only=True, c_in=dim_in
                    )
                    wfk, bfk = Block(
                        self.dim, self.groups, dtype=self.dtype, name="final_block"
                    )(None, weights_only=True, c_in=dim_in)
                    wo, bo = Conv1x1Pair(
                        self.out_dim, dtype=self.dtype, name="final_conv"
                    )(None, weights_only=True, c_in=self.dim)
                    if pad_out:
                        # dead zero ε lanes for the lane-padded carry —
                        # mirrors Conv1x1Pair(pad_out_to).
                        wo = jnp.pad(wo, ((0, 0), (0, 1)))
                        bo = jnp.pad(bo, ((0, 1),))
                    return tail_fuse(
                        x.astype(self.dtype), kt, bt, wfk, bfk, wo, bo,
                        _l.TAIL_INTERPRET,
                    )
            x = Upsample(self.dtype, name=f"up_{i}_upsample")(x)

        x = Block(self.dim, self.groups, dtype=self.dtype, name="final_block")(x)
        # Param-compatible with nn.Conv(out_dim, (1,1)) — same names, shapes,
        # and init — but able to emit extra zero output lanes so ε matches a
        # lane-padded carry (see pad_out above).
        return Conv1x1Pair(
            self.out_dim, dtype=self.dtype, name="final_conv",
            pad_out_to=self.out_dim + 1 if pad_out else 0,
        )(x)

    @staticmethod
    def select_cond_features(feas: list[jnp.ndarray]) -> jnp.ndarray:
        """Concat every 3rd RRDB feature (reference ``model.py:825``)."""
        return jnp.concatenate(feas[2::3], axis=-1)
