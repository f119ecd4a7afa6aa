"""LPIPS perceptual metric (AlexNet backbone) in Flax.

Native implementation of the metric the reference pulls in via the ``lpips``
package (``srdiff/model.py:1501,1530-1535``). Pretrained AlexNet + linear-head
weights cannot be downloaded in this environment (zero egress), so the class
is weight-gated: :meth:`maybe_create` returns ``None`` unless a weights file
(``.npz`` of this module's param pytree, or a torch ``lpips`` state_dict
convertible via ``ckpt.torch_import.import_lpips``) is supplied.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import freeze
from flax import traverse_util


class _AlexFeatures(nn.Module):
    """AlexNet feature trunk, returning the 5 relu taps LPIPS uses."""

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)), name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv5")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


class _LPIPSNet(nn.Module):
    """Normalised-feature L2 with learned per-channel weights."""

    lin_dims: tuple[int, ...] = (64, 192, 384, 256, 256)

    @nn.compact
    def __call__(self, a, b):
        shift = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
        scale = jnp.array([0.458, 0.448, 0.450], jnp.float32)
        a = (a - shift) / scale
        b = (b - shift) / scale
        net = _AlexFeatures(name="alex")
        fa = net(a)
        fb = net(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            # lpips.normalize_tensor: x / (sqrt(sum(x^2)) + eps), eps OUTSIDE
            # the sqrt (lpips/__init__.py)
            na = xa / (jnp.sqrt(jnp.sum(xa**2, axis=-1, keepdims=True)) + 1e-10)
            nb = xb / (jnp.sqrt(jnp.sum(xb**2, axis=-1, keepdims=True)) + 1e-10)
            d = (na - nb) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


class LPIPS:
    """Weight-gated LPIPS scorer over uint8 HWC or [-1,1] float images."""

    def __init__(self, params: Any):
        self._net = _LPIPSNet()
        self._params = params
        self._fn = jax.jit(lambda p, a, b: self._net.apply(p, a, b))

    @classmethod
    def maybe_create(cls, weights_path: str | None) -> "LPIPS | None":
        if not weights_path or not os.path.exists(weights_path):
            return None
        if weights_path.endswith(".npz"):
            raw = dict(np.load(weights_path))
            params = freeze(
                traverse_util.unflatten_dict(
                    {tuple(k.split("/")): jnp.asarray(v) for k, v in raw.items()}
                )
            )
            return cls(params)
        # torch `lpips.LPIPS(net='alex')` state_dict file (.pt/.pth/.ckpt)
        from dgm_img_super_resolution_tpu.ckpt.torch_import import import_lpips

        return import_lpips(weights_path)

    @staticmethod
    def init_params(rng) -> Any:
        """Random-init param pytree (for tests / shape checks)."""
        net = _LPIPSNet()
        dummy = jnp.zeros((1, 64, 64, 3))
        return net.init(rng, dummy, dummy)

    def __call__(self, img_a, img_b) -> float:
        def prep(x):
            x = np.asarray(x)
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / 127.5 - 1.0
            if x.ndim == 3:
                x = x[None]
            return jnp.asarray(x, jnp.float32)

        return float(self._fn(self._params, prep(img_a), prep(img_b))[0])
