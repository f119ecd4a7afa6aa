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

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dgm_img_super_resolution_tpu.models.layers import sinusoidal_pos_emb
from dgm_img_super_resolution_tpu.models.sd.attention import Transformer2D
from dgm_img_super_resolution_tpu.ops.resize import nearest_upsample
from dgm_img_super_resolution_tpu.models.layers import gn_groups as _gn

Dtype = Any


class SDResBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=_gn(x.shape[-1]), dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), dtype=self.dtype, name="norm2")(h)
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
    cross_attention_dim: int = 1024
    transformer_depth: int = 1
    use_flash: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, encoder_hidden_states, class_labels=None):
        """x: (N,H,W,in_ch) latent⊕LR; timesteps: (N,); encoder_hidden_states:
        (N, L, cross_dim) text embedding; class_labels: (N,) LR noise level."""
        chs = list(self.block_out_channels)
        tdim = chs[0] * 4

        temb = sinusoidal_pos_emb(timesteps, chs[0]).astype(self.dtype)
        temb = nn.Dense(tdim, dtype=self.dtype, name="time_embed_0")(temb)
        temb = nn.Dense(tdim, dtype=self.dtype, name="time_embed_1")(nn.silu(temb))
        if class_labels is not None:
            # noise-level conditioning: a second sinusoidal embedding summed in
            cemb = sinusoidal_pos_emb(class_labels, chs[0]).astype(self.dtype)
            cemb = nn.Dense(tdim, dtype=self.dtype, name="class_embed_0")(cemb)
            cemb = nn.Dense(tdim, dtype=self.dtype, name="class_embed_1")(nn.silu(cemb))
            temb = temb + cemb

        ctx = encoder_hidden_states

        h = nn.Conv(chs[0], (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(x)
        skips = [h]
        for i, ch in enumerate(chs):
            for j in range(self.layers_per_block):
                h = SDResBlock(ch, self.dtype, name=f"down_{i}_res_{j}")(h, temb)
                if i in self.attn_levels:
                    h = Transformer2D(
                        ch // self.head_dim, self.head_dim, self.transformer_depth,
                        self.use_flash, self.dtype, name=f"down_{i}_attn_{j}",
                    )(h, ctx)
                skips.append(h)
            if i < len(chs) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        h = SDResBlock(chs[-1], self.dtype, name="mid_res_0")(h, temb)
        h = Transformer2D(
            chs[-1] // self.head_dim, self.head_dim, self.transformer_depth,
            self.use_flash, self.dtype, name="mid_attn",
        )(h, ctx)
        h = SDResBlock(chs[-1], self.dtype, name="mid_res_1")(h, temb)

        for i, ch in enumerate(reversed(chs)):
            level = len(chs) - 1 - i
            for j in range(self.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = SDResBlock(ch, self.dtype, name=f"up_{i}_res_{j}")(h, temb)
                if level in self.attn_levels:
                    h = Transformer2D(
                        ch // self.head_dim, self.head_dim, self.transformer_depth,
                        self.use_flash, self.dtype, name=f"up_{i}_attn_{j}",
                    )(h, ctx)
            if level > 0:
                h = nearest_upsample(h, 2)
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(h)
