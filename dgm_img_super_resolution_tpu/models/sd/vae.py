"""AutoencoderKL (the SD VAE) in NHWC Flax.

The decode stage is the last step of the reference's SD x4-upscaler pipeline
(black-boxed inside ``diffusers`` — reference ``st_app2.py:62-67``; SURVEY.md
§2.8 fixes "VAE decode" as a capability to build natively). Encoder included
for completeness (image-space conditioning / training).

Architecture follows the published SD VAE design: GroupNorm(32)+SiLU ResNet
blocks, a mid self-attention, nearest-up+conv upsampling. The x4-upscaler's
VAE is f=4 (two resolution halvings): ``block_out_channels=(128, 256, 512)``,
4 latent channels, scaling factor 0.08333.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgm_img_super_resolution_tpu.ops.resize import nearest_upsample
from dgm_img_super_resolution_tpu.models.layers import gn_groups as _gn

Dtype = Any


class VAEResnetBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=_gn(x.shape[-1]), dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=_gn(x.shape[-1]), dtype=self.dtype, name="norm")(x)
        y = y.reshape(n, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        scores = jnp.einsum("bqc,bkc->bqk", q, k) * (c**-0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(y.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(n, h, w, c)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        chs = self.block_out_channels
        h = nn.Conv(chs[0], (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(chs):
            for j in range(self.layers_per_block):
                h = VAEResnetBlock(ch, self.dtype, name=f"down_{i}_res_{j}")(h)
            if i < len(chs) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = VAEResnetBlock(chs[-1], self.dtype, name="mid_res_0")(h)
        h = VAEAttention(self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(chs[-1], self.dtype, name="mid_res_1")(h)
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * self.latent_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(h)
        return h  # (mean, logvar) stacked on channels


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        chs = list(self.block_out_channels)[::-1]  # deepest first
        h = nn.Conv(chs[0], (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(z)
        h = VAEResnetBlock(chs[0], self.dtype, name="mid_res_0")(h)
        h = VAEAttention(self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(chs[0], self.dtype, name="mid_res_1")(h)
        for i, ch in enumerate(chs):
            for j in range(self.layers_per_block + 1):
                h = VAEResnetBlock(ch, self.dtype, name=f"up_{i}_res_{j}")(h)
            if i < len(chs) - 1:
                h = nearest_upsample(h, 2)
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = 0.08333
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, self.layers_per_block, self.latent_channels, self.dtype
        )
        self.decoder = Decoder(
            self.block_out_channels, self.layers_per_block, 3, self.dtype
        )
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype)

    def encode(self, x, rng=None):
        """x in [-1,1] → sampled (or mean if no rng) scaled latents."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * jax.random.normal(
                rng, mean.shape, mean.dtype
            )
        return mean * self.scaling_factor

    def decode(self, z):
        """Scaled latents → image in [-1,1]."""
        return self.decoder(self.post_quant_conv(z / self.scaling_factor))

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng))
