"""Text-conditioned UNet (UNet2DCondition) for the SD x4-upscaler, NHWC Flax.

The denoiser inside the reference's ``StableDiffusionUpscalePipeline``
dependency (reference ``st_app2.py:15-27``; SURVEY.md §2.8: "text-cond UNet
w/ cross-attn + noise-level conditioning" is a capability to build).

Architecture follows the published x4-upscaler design: the 4-channel latent
is channel-concatenated with the (noise-augmented) 3-channel LR image
(in_channels=7); down/up blocks are GroupNorm+SiLU ResBlocks with
Transformer2D cross-attention to the text embedding; the LR noise level is a
second timestep-like class embedding added to the time embedding.

Defaults are sized like the published model (block channels 256→512→512→1024,
cross-attention dim 1024) but every knob is a field, so tiny configs compile
in tests.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dgm_img_super_resolution_tpu.models.sd.attention import Transformer2D
from dgm_img_super_resolution_tpu.ops.resize import nearest_upsample
from dgm_img_super_resolution_tpu.models.layers import gn_groups as _gn

Dtype = Any

# diffusers UNet GroupNorms use norm_eps=1e-5 (UNet2DConditionModel config
# default); flax's GroupNorm default is 1e-6 — pinned by the torch twins
# (tests/test_sd_torch_parity.py)
_NORM_EPS = 1e-5


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal timestep embedding in the *diffusers* convention
    (``get_timestep_embedding`` with ``flip_sin_to_cos=True``,
    ``downscale_freq_shift=0``, as ``UNet2DConditionModel`` configures its
    ``Timesteps`` projection): frequencies ``exp(-ln(1e4)·i/half)`` and
    [cos, sin] ordering.

    NOT the SRDiff convention (``log(1e4)/(half-1)`` spacing, [sin, cos] —
    ``layers.sinusoidal_pos_emb``): using that here produced activations that
    matched nothing the published checkpoint was trained with — the exact
    class of silent bug the round-3 torch twins exist to catch."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class SDResBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=_gn(x.shape[-1]), epsilon=_NORM_EPS,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), epsilon=_NORM_EPS,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class UNet2DCondition(nn.Module):
    in_channels: int = 7
    out_channels: int = 4
    block_out_channels: Sequence[int] = (256, 512, 512, 1024)
    layers_per_block: int = 2
    attn_levels: Sequence[int] = (1, 2, 3)  # levels with cross-attention
    head_dim: int = 64
    num_heads: int | None = None
    """SD-era diffusers semantics: ``attention_head_dim`` in the published
    config is the *head count* (8 for the x4-upscaler); when set, every
    attention uses ``num_heads`` heads of ``ch // num_heads`` dims. When
    ``None``, heads are derived from ``head_dim`` instead."""
    only_cross_attention: Sequence[bool] | None = None
    """Per-level flags (published x4-upscaler: (True, True, True, False)):
    attn1 in that level's transformer blocks cross-attends to the text
    states instead of self-attending. ``None`` → all False."""
    num_class_embeds: int | None = None
    """When set (1000 in the published model), the class/noise-level
    conditioning is a learned ``nn.Embed(num_class_embeds, 4*ch0)`` lookup
    (diffusers ``class_embedding.weight``); when ``None``, a second
    sinusoidal+MLP timestep embedding is used."""
    cross_attention_dim: int = 1024
    transformer_depth: int = 1
    use_flash: bool = True
    """Pallas flash attention for ≥1024-token self-attention (the 128²-latent
    production shape is 16k tokens). Default ON: measured at the production
    operating point (128→512, 20 steps, CFG, real v5e chip) it matches plain
    XLA attention steady-state (0.661 vs 0.660 s p50 per image) and compiles
    8.5× faster (17.2 s vs 145.7 s) — the O(L²) score matrix never
    materialises. Off-TPU it runs in interpret mode (ops/pallas/attention.py)."""
    dtype: Dtype = jnp.float32

    def _heads(self, ch: int) -> tuple[int, int]:
        if self.num_heads is not None:
            return self.num_heads, ch // self.num_heads
        return ch // self.head_dim, self.head_dim

    def _only_cross(self, level: int) -> bool:
        if self.only_cross_attention is None:
            return False
        return bool(self.only_cross_attention[level])

    @classmethod
    def from_config(cls, cfg: dict, dtype=jnp.float32, use_flash: bool = True):
        """Build from a diffusers-style config dict (see
        ``ckpt/sd_inventory.py`` for the vendored x4-upscaler config)."""
        down_types = cfg.get("down_block_types", ())
        attn_levels = tuple(
            i for i, t in enumerate(down_types) if "CrossAttn" in t
        ) or tuple(cfg.get("attn_levels", (1, 2, 3)))
        oc = cfg.get("only_cross_attention")
        return cls(
            in_channels=cfg.get("in_channels", 7),
            out_channels=cfg.get("out_channels", 4),
            block_out_channels=tuple(cfg.get("block_out_channels", (256, 512, 512, 1024))),
            layers_per_block=cfg.get("layers_per_block", 2),
            attn_levels=attn_levels,
            num_heads=cfg.get("attention_head_dim"),  # SD-era: head COUNT
            only_cross_attention=tuple(oc) if oc is not None else None,
            num_class_embeds=cfg.get("num_class_embeds"),
            cross_attention_dim=cfg.get("cross_attention_dim", 1024),
            dtype=dtype,
            use_flash=use_flash,
        )

    @nn.compact
    def __call__(self, x, timesteps, encoder_hidden_states, class_labels=None,
                 *, mode="full", enc_feats=None):
        """x: (N,H,W,in_ch) latent⊕LR; timesteps: (N,); encoder_hidden_states:
        (N, L, cross_dim) text embedding; class_labels: (N,) LR noise level.

        ``mode`` splits the forward at the bottleneck for encoder propagation
        (arXiv 2312.09608, same mechanism as the SRDiff UNet): ``"encode"``
        returns ``(skips, h)`` after the down path; ``"decode"`` takes
        ``enc_feats=(skips, h)`` (``x`` may be None) and runs mid/up/out."""
        chs = list(self.block_out_channels)
        tdim = chs[0] * 4

        temb = timestep_embedding(timesteps, chs[0]).astype(self.dtype)
        temb = nn.Dense(tdim, dtype=self.dtype, name="time_embed_0")(temb)
        temb = nn.Dense(tdim, dtype=self.dtype, name="time_embed_1")(nn.silu(temb))
        if class_labels is not None:
            if self.num_class_embeds is not None:
                cemb = nn.Embed(
                    self.num_class_embeds, tdim, dtype=self.dtype, name="class_embedding"
                )(class_labels)
            else:
                # timestep-style class conditioning (sinusoidal + MLP; the
                # diffusers class_embed_type="timestep" path reuses the same
                # Timesteps projection as the main time embedding)
                cemb = timestep_embedding(class_labels, chs[0]).astype(self.dtype)
                cemb = nn.Dense(tdim, dtype=self.dtype, name="class_embed_0")(cemb)
                cemb = nn.Dense(tdim, dtype=self.dtype, name="class_embed_1")(nn.silu(cemb))
            temb = temb + cemb

        ctx = encoder_hidden_states

        if mode == "decode":
            skips = list(enc_feats[0])
            h = enc_feats[1]
        else:
            h = nn.Conv(chs[0], (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(x)
            skips = [h]
            for i, ch in enumerate(chs):
                nh, hd = self._heads(ch)
                for j in range(self.layers_per_block):
                    h = SDResBlock(ch, self.dtype, name=f"down_{i}_res_{j}")(h, temb)
                    if i in self.attn_levels:
                        h = Transformer2D(
                            nh, hd, self.transformer_depth, self.use_flash, self.dtype,
                            self._only_cross(i), name=f"down_{i}_attn_{j}",
                        )(h, ctx)
                    skips.append(h)
                if i < len(chs) - 1:
                    h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                dtype=self.dtype, name=f"down_{i}_downsample")(h)
                    skips.append(h)
            if mode == "encode":
                return tuple(skips), h

        nh, hd = self._heads(chs[-1])
        h = SDResBlock(chs[-1], self.dtype, name="mid_res_0")(h, temb)
        h = Transformer2D(
            nh, hd, self.transformer_depth, self.use_flash, self.dtype,
            name="mid_attn",
        )(h, ctx)
        h = SDResBlock(chs[-1], self.dtype, name="mid_res_1")(h, temb)

        for i, ch in enumerate(reversed(chs)):
            level = len(chs) - 1 - i
            nh, hd = self._heads(ch)
            for j in range(self.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = SDResBlock(ch, self.dtype, name=f"up_{i}_res_{j}")(h, temb)
                if level in self.attn_levels:
                    h = Transformer2D(
                        nh, hd, self.transformer_depth, self.use_flash, self.dtype,
                        self._only_cross(level), name=f"up_{i}_attn_{j}",
                    )(h, ctx)
            if level > 0:
                h = nearest_upsample(h, 2)
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), epsilon=_NORM_EPS,
                         dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(h)
