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
    """Simple MNIST generator: Linear(z,256) → LeakyReLU(0.01) → Linear(256,
    784) → tanh (reference ``simple_gan.ipynb`` cell 7)."""

    z_dim: int = 64
    hidden: Sequence[int] = (256,)
    out_dim: int = 784
    slope: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):  # train unused: norm-free
        x = z
        for i, h in enumerate(self.hidden):
            x = leaky_relu(nn.Dense(h, dtype=self.dtype, name=f"fc{i}")(x), self.slope)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc_out")(x)
        return jnp.tanh(x)


class MLPDiscriminator(nn.Module):
    """Simple MNIST discriminator: Linear(784,128) → LeakyReLU(0.01) →
    Linear(128,1) (reference ``simple_gan.ipynb`` cell 5; sigmoid lives in
    the BCE-with-logits loss for stability)."""

    hidden: Sequence[int] = (128,)
    slope: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):  # train unused: norm-free trunk
        x = x.reshape(x.shape[0], -1)
        for i, h in enumerate(self.hidden):
            x = leaky_relu(nn.Dense(h, dtype=self.dtype, name=f"fc{i}")(x), self.slope)
        return nn.Dense(1, dtype=self.dtype, name="fc_out")(x)  # logits


_N002 = nn.initializers.normal(0.02)  # reference weights_init (dcgan.ipynb cell 14)


class DCGANGenerator(nn.Module):
    """28×28 MNIST generator (reference ``dcgan.ipynb`` cell 7 /
    ``wgan-gp.ipynb`` cell 19): ConvT(z→4h,k3,s2) → ConvT(4h→2h,k4,s1) →
    ConvT(2h→h,k3,s2), each +BatchNorm+ReLU, then ConvT(h→c,k4,s2)+tanh; all
    convs unpadded (1→3→6→13→28). Weights N(0, 0.02)."""

    z_dim: int = 64
    out_ch: int = 1
    hidden_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        h = self.hidden_dim
        x = z.reshape(z.shape[0], 1, 1, z.shape[-1])
        for i, (f, k, s) in enumerate(((4 * h, 3, 2), (2 * h, 4, 1), (h, 3, 2))):
            x = ConvTranspose2dTorch(
                f, k, s, 0, dtype=self.dtype, kernel_init=_N002, name=f"deconv{i}"
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, scale_init=_N002, dtype=self.dtype,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        x = ConvTranspose2dTorch(
            self.out_ch, 4, 2, 0, dtype=self.dtype, kernel_init=_N002, name="deconv_out"
        )(x)
        return jnp.tanh(x)  # 28×28


class DCGANDiscriminator(nn.Module):
    """28×28 discriminator/critic trunk (reference ``dcgan.ipynb`` cell 8 /
    ``wgan-gp.ipynb`` cell 21): Conv(c→h,k4,s2)+BN+LeakyReLU(0.2) →
    Conv(h→2h,k4,s2)+BN+LeakyReLU(0.2) → Conv(2h→1,k4,s2), unpadded
    (28→13→5→1). Returns (N, 1) logits — the sigmoid lives in the loss."""

    hidden_dim: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = self.hidden_dim
        for i, f in enumerate((h, 2 * h)):
            x = nn.Conv(
                f, (4, 4), strides=(2, 2), padding="VALID", dtype=self.dtype,
                kernel_init=_N002, name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, scale_init=_N002, dtype=self.dtype,
                name=f"bn{i}",
            )(x)
            x = leaky_relu(x, 0.2)
        x = nn.Conv(
            1, (4, 4), strides=(2, 2), padding="VALID", dtype=self.dtype,
            kernel_init=_N002, name="conv_out",
        )(x)
        return x.reshape(x.shape[0], -1)  # (N, 1) logits


class Critic(nn.Module):
    """WGAN-GP critic (reference ``wgan-gp.ipynb`` cell 21): the same conv
    trunk at hidden_dim=64 with a linear (unbounded) output."""

    hidden_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return DCGANDiscriminator(self.hidden_dim, dtype=self.dtype, name="trunk")(x, train)
