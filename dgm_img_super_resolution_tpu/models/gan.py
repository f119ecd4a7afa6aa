"""GAN model zoo (the reference's educational adversarial models).

- :class:`MLPGenerator`/:class:`MLPDiscriminator` — the simple MNIST GAN of
  ``notebooks/simple_gan.ipynb`` (z=64 → 784 tanh generator; 784 → 1 sigmoid
  discriminator).
- :class:`DCGANGenerator`/:class:`DCGANDiscriminator` — conv GAN per
  ``notebooks/dcgan.ipynb``: transposed-conv blocks with BatchNorm+ReLU and a
  tanh head; strided-conv discriminator with BatchNorm+LeakyReLU(0.2) and a
  sigmoid head (sigmoid applied in the loss for numerical stability).
- :class:`Critic` — WGAN-GP critic per ``notebooks/wgan-gp.ipynb``: same conv
  trunk but no norm (per the WGAN-GP paper's guidance) and a linear head.

All NHWC Flax; BatchNorm uses batch statistics during training (the
``batch_stats`` collection is threaded by ``train/tasks/gan.py``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dgm_img_super_resolution_tpu.models.layers import ConvTranspose2dTorch, leaky_relu

Dtype = Any


class MLPGenerator(nn.Module):
    z_dim: int = 64
    hidden: Sequence[int] = (128, 256, 512, 1024)
    out_dim: int = 784
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = z
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc_out")(x)
        return jnp.tanh(x)


class MLPDiscriminator(nn.Module):
    hidden: Sequence[int] = (512, 256, 128)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):  # train unused: norm-free trunk
        x = x.reshape(x.shape[0], -1)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.dtype, name=f"fc{i}")(x)
            x = leaky_relu(x, 0.2)
        return nn.Dense(1, dtype=self.dtype, name="fc_out")(x)  # logits


class DCGANGenerator(nn.Module):
    """z → 64×64 image: ConvT(s1,k4) 4×4 then 4× ConvT(s2) doublings."""

    z_dim: int = 128
    base: int = 512
    out_ch: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = z.reshape(z.shape[0], 1, 1, z.shape[-1])
        x = ConvTranspose2dTorch(self.base, 4, 1, 0, dtype=self.dtype, name="deconv0")(x)  # 4×4
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn0")(x)
        x = nn.relu(x)
        feats = [self.base // 2, self.base // 4, self.base // 8]
        for i, f in enumerate(feats, start=1):
            x = ConvTranspose2dTorch(f, 4, 2, 1, dtype=self.dtype, name=f"deconv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = ConvTranspose2dTorch(self.out_ch, 4, 2, 1, dtype=self.dtype, name="deconv_out")(x)
        return jnp.tanh(x)  # 64×64


class DCGANDiscriminator(nn.Module):
    base: int = 64
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = [self.base, self.base * 2, self.base * 4]
        for i, f in enumerate(feats):
            x = nn.Conv(f, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"conv{i}")(x)
            if self.use_norm and i > 0:
                x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"bn{i}")(x)
            x = leaky_relu(x, 0.2)
        x = nn.Conv(self.base * 8, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv3")(x)
        x = leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, dtype=self.dtype, name="fc_out")(x)  # logits


class Critic(nn.Module):
    """WGAN-GP critic: norm-free conv trunk + linear head
    (``notebooks/wgan-gp.ipynb`` cells 22-27)."""

    base: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return DCGANDiscriminator(self.base, use_norm=False, dtype=self.dtype, name="trunk")(x, train)
