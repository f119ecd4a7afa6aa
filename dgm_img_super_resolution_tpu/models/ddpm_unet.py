"""From-scratch DDPM UNet (the reference's ``basic_diffusion`` capability).

The reference notebook is a missing large blob; its architecture survives in
``basic_diffusion_model.png`` (SURVEY.md §2.9): noisy image + noise level →
init conv + sinusoidal time embedding → 3 down blocks (2×resnet with
GroupNorm, attention, downsample) → bottleneck (resnet + attention + resnet)
→ 3 up blocks with skip connections → final resnet + conv → noise prediction.

Built NHWC for 32×32 training; GroupNorm-ed ResnetBlocks (groups=8) and full
softmax self-attention (cheap at ≤16² tokens; two MXU matmuls per head).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgm_img_super_resolution_tpu.models.layers import (
    Block,
    Downsample,
    ResnetBlock,
    Upsample,
    mish,
    sinusoidal_pos_emb,
)

Dtype = Any


class SelfAttention2D(nn.Module):
    """Full softmax self-attention over the pixel grid (pre-norm, residual)."""

    heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=min(8, c), dtype=self.dtype, name="norm")(x)
        qkv = nn.Conv(c * 3, (1, 1), use_bias=False, dtype=self.dtype, name="to_qkv")(y)
        qkv = qkv.reshape(n, h * w, 3, self.heads, c // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (c // self.heads) ** -0.5
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="to_out")(out)
        return x + out


class DDPMUnet(nn.Module):
    dim: int = 64
    out_dim: int = 1
    dim_mults: Sequence[int] = (1, 2, 4)
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time):
        in_ch = x.shape[-1]
        dims = [self.dim * m for m in self.dim_mults]

        t = sinusoidal_pos_emb(time, self.dim).astype(self.dtype)
        t = nn.Dense(self.dim * 4, dtype=self.dtype, name="time_mlp_0")(t)
        t = nn.Dense(self.dim, dtype=self.dtype, name="time_mlp_1")(mish(t))

        x = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype, name="init_conv")(x)

        skips = []
        for i, d in enumerate(dims):
            x = ResnetBlock(d, self.dim, self.groups, self.dtype, name=f"down_{i}_res1")(x, t)
            x = ResnetBlock(d, self.dim, self.groups, self.dtype, name=f"down_{i}_res2")(x, t)
            x = SelfAttention2D(dtype=self.dtype, name=f"down_{i}_attn")(x)
            skips.append(x)
            if i < len(dims) - 1:
                x = Downsample(self.dtype, name=f"down_{i}_downsample")(x)

        x = ResnetBlock(dims[-1], self.dim, self.groups, self.dtype, name="mid_res1")(x, t)
        x = SelfAttention2D(dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(dims[-1], self.dim, self.groups, self.dtype, name="mid_res2")(x, t)

        for i, d in enumerate(reversed(dims)):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock(d, self.dim, self.groups, self.dtype, name=f"up_{i}_res1")(x, t)
            x = ResnetBlock(d, self.dim, self.groups, self.dtype, name=f"up_{i}_res2")(x, t)
            x = SelfAttention2D(dtype=self.dtype, name=f"up_{i}_attn")(x)
            if i < len(dims) - 1:
                x = Upsample(self.dtype, name=f"up_{i}_upsample")(x)

        x = Block(self.dim, self.groups, dtype=self.dtype, name="final_res")(x)
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="final_conv")(x)
