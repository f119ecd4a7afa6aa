"""RRDB low-resolution encoder (NHWC Flax).

Capability twin of the reference ESRGAN-style encoder
(``srdiff/model.py:670-749``): dense residual blocks with LeakyReLU(0.2) and
0.2 residual scaling, an ``nb``-block trunk with global skip, and a ×4 (or ×8)
nearest-upsample head. ``__call__(x, get_fea=True)`` additionally returns the
per-block features + fused trunk feature that condition the diffusion UNet.

TPU notes: all convs are 3×3 zero-padded NHWC convs (MXU); channel counts
(nf=32, gc=16 for the SRDiff config) are small, so the whole encoder runs once
per image *outside* the sampling scan and its activations stay HBM-resident.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from dgm_img_super_resolution_tpu.models.layers import leaky_relu
from dgm_img_super_resolution_tpu.ops.resize import nearest_upsample

Dtype = Any


def _conv3(features: int, name: str, dtype) -> nn.Conv:
    return nn.Conv(features, (3, 3), padding=((1, 1), (1, 1)), dtype=dtype, name=name)


class ResidualDenseBlock5C(nn.Module):
    """5 densely-connected 3×3 convs, growth ``gc``, residual scale 0.2
    (reference ``model.py:670-690``)."""

    nf: int
    gc: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1 = leaky_relu(_conv3(self.gc, "conv1", self.dtype)(x))
        x2 = leaky_relu(_conv3(self.gc, "conv2", self.dtype)(jnp.concatenate([x, x1], -1)))
        x3 = leaky_relu(_conv3(self.gc, "conv3", self.dtype)(jnp.concatenate([x, x1, x2], -1)))
        x4 = leaky_relu(_conv3(self.gc, "conv4", self.dtype)(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = _conv3(self.nf, "conv5", self.dtype)(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block: 3×RDB + outer 0.2-scaled skip."""

    nf: int
    gc: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB1")(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB2")(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    """RRDB SR network; SRDiff config instantiates
    ``RRDBNet(out_nc=3, nf=32, nb=8, gc=16, sr_scale=4)``.

    Input/output use the framework's [-1, 1] convention: input is remapped to
    [0, 1] internally and the output is clamped then mapped back, matching
    reference ``model.py:727-748``.
    """

    out_nc: int = 3
    nf: int = 32
    nb: int = 8
    gc: int = 32
    sr_scale: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, get_fea: bool = False):
        feas = []
        x = (x + 1.0) / 2.0
        fea_first = fea = _conv3(self.nf, "conv_first", self.dtype)(x)
        for i in range(self.nb):
            fea = RRDB(self.nf, self.gc, self.dtype, name=f"RRDB_trunk_{i}")(fea)
            feas.append(fea)
        trunk = _conv3(self.nf, "trunk_conv", self.dtype)(fea)
        fea = fea_first + trunk
        feas.append(fea)

        fea = leaky_relu(_conv3(self.nf, "upconv1", self.dtype)(nearest_upsample(fea, 2)))
        fea = leaky_relu(_conv3(self.nf, "upconv2", self.dtype)(nearest_upsample(fea, 2)))
        if self.sr_scale == 8:
            fea = leaky_relu(_conv3(self.nf, "upconv3", self.dtype)(nearest_upsample(fea, 2)))
        fea_hr = _conv3(self.nf, "HRconv", self.dtype)(fea)
        out = _conv3(self.out_nc, "conv_last", self.dtype)(leaky_relu(fea_hr))
        out = jnp.clip(out, 0.0, 1.0) * 2.0 - 1.0
        if get_fea:
            return out, feas
        return out
