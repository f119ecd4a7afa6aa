"""Autoencoder and VAE (the reference's educational AE/VAE capability).

- :class:`ConvEncoder`/:class:`ConvDecoder`/:class:`AutoEncoder` mirror the
  simple conv AE of ``notebooks/simple_autoencoder.ipynb`` (3 stride-2 convs →
  flatten → Dense(latent); Dense → 3 transposed convs → sigmoid conv) in
  NHWC Flax.
- :class:`VAE` fills the reference's empty ``notebooks/vae.ipynb`` stub: the
  same conv trunk with μ/logσ² heads, reparameterised sampling, and an ELBO
  loss (see ``train/tasks/vae.py``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgm_img_super_resolution_tpu.models.layers import ConvTranspose2dTorch

Dtype = Any


class ConvEncoder(nn.Module):
    latent_dim: int = 2
    features: Sequence[int] = (32, 64, 128)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.latent_dim, dtype=self.dtype, name="fc")(x)


class ConvDecoder(nn.Module):
    """Dense(latent→base²·128) → reshape → 3× [ConvT(k3,s2,p1,op1) + ReLU]
    (128→128→64→32) → Conv3x3(SAME)→1ch → sigmoid — the exact layer stack of
    ``simple_autoencoder.ipynb`` cell 4. (That notebook encodes 28×28 but
    decodes to 32×32, an unreconciled defect — it has no training loop; here
    the default is self-consistent 32×32.)"""

    out_hw: int = 32
    out_ch: int = 1
    features: Sequence[int] = (128, 128, 64, 32)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        base = self.out_hw // 2 ** (len(self.features) - 1)
        x = nn.Dense(base * base * self.features[0], dtype=self.dtype, name="fc")(z)
        x = x.reshape(z.shape[0], base, base, self.features[0])
        for i, f in enumerate(self.features[1:], start=1):
            x = ConvTranspose2dTorch(
                f, 3, 2, 1, output_padding=1, dtype=self.dtype, name=f"deconv{i}"
            )(x)
            x = nn.relu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(x)
        return nn.sigmoid(x)


class AutoEncoder(nn.Module):
    latent_dim: int = 2
    out_hw: int = 32
    out_ch: int = 1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = ConvEncoder(self.latent_dim, dtype=self.dtype)
        self.decoder = ConvDecoder(self.out_hw, self.out_ch, dtype=self.dtype)

    def __call__(self, x):
        return self.decoder(self.encoder(x))

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)


class VAE(nn.Module):
    latent_dim: int = 16
    out_hw: int = 32
    out_ch: int = 1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.trunk = ConvEncoder(self.latent_dim * 2, dtype=self.dtype)
        self.decoder = ConvDecoder(self.out_hw, self.out_ch, dtype=self.dtype)

    def encode(self, x):
        h = self.trunk(x)
        mu, logvar = jnp.split(h, 2, axis=-1)
        return mu, logvar

    def reparameterize(self, rng, mu, logvar):
        eps = jax.random.normal(rng, mu.shape, mu.dtype)
        return mu + jnp.exp(0.5 * logvar) * eps

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, rng):
        mu, logvar = self.encode(x)
        z = self.reparameterize(rng, mu, logvar)
        return self.decode(z), mu, logvar
