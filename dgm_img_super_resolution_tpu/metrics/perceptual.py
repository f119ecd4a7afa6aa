"""VGG19 feature extractor + perceptual loss.

Capability twin of the reference's ``VGGFeatureExtractor``/``PerceptualLoss``
(``srdiff/model.py:225-269``): VGG19 features up to layer 34 (conv5_4, before
its ReLU per the feature_layer+1 slice), inputs in [-1, 1] normalised with the
reference's shifted ImageNet stats, L1 between feature maps.

Pretrained VGG19 weights cannot be downloaded here (zero egress); the module
is weight-gated like LPIPS: `PerceptualLoss.maybe_create` returns None
without a weights file, and the torch importer in ``ckpt/torch_import.py``
converts a torchvision ``vgg19`` state_dict when one is supplied locally.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import linen as nn
from flax import traverse_util

# VGG19 conv plan up to torchvision features index 34 (conv5_4):
# (out_channels, torchvision_layer_index); 'M' = maxpool
_VGG19_PLAN = [
    (64, 0), (64, 2), "M",
    (128, 5), (128, 7), "M",
    (256, 10), (256, 12), (256, 14), (256, 16), "M",
    (512, 19), (512, 21), (512, 23), (512, 25), "M",
    (512, 28), (512, 30), (512, 32), (512, 34),
]


class VGG19Features(nn.Module):
    """VGG19 trunk to conv5_4 (reference feature_layer=34). NHWC."""

    use_input_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_input_norm:
            # [-1,1]-shifted ImageNet stats (reference model.py:236-241)
            mean = jnp.array([0.485 - 1.0, 0.456 - 1.0, 0.406 - 1.0], jnp.float32)
            std = jnp.array([0.229 * 2.0, 0.224 * 2.0, 0.225 * 2.0], jnp.float32)
            x = (x - mean) / std
        h = x.astype(self.dtype)
        last = len([p for p in _VGG19_PLAN if p != "M"]) - 1
        conv_i = 0
        for item in _VGG19_PLAN:
            if item == "M":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
                continue
            ch, torch_idx = item
            h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv_{torch_idx}")(h)
            if conv_i != last:  # final layer's features taken pre-ReLU
                h = nn.relu(h)
            conv_i += 1
        return h


class PerceptualLoss:
    """L1 on VGG19 features (reference ``PerceptualLoss``, model.py:255-269)."""

    def __init__(self, params: Any):
        self.net = VGG19Features()
        self.params = params

    @classmethod
    def maybe_create(cls, weights_path: str | None) -> "PerceptualLoss | None":
        if not weights_path or not os.path.exists(weights_path):
            return None
        raw = dict(np.load(weights_path))
        params = traverse_util.unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in raw.items()}
        )
        return cls(params)

    @classmethod
    def from_torch_vgg19(cls, state_dict: dict) -> "PerceptualLoss":
        """Build from a torchvision ``vgg19().state_dict()`` (or its
        ``features.``-prefixed subset)."""
        flat = {}
        for key, v in state_dict.items():
            k = key[len("features.") :] if key.startswith("features.") else key
            parts = k.split(".")
            if len(parts) != 2 or not parts[0].isdigit():
                continue
            idx, kind = int(parts[0]), parts[1]
            v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            if kind == "weight":
                flat[(f"conv_{idx}", "kernel")] = jnp.asarray(np.transpose(v, (2, 3, 1, 0)))
            elif kind == "bias":
                flat[(f"conv_{idx}", "bias")] = jnp.asarray(v)
        return cls({"params": traverse_util.unflatten_dict(flat)})

    def __call__(self, high_resolution, fake_high_resolution):
        fa = self.net.apply(self.params, high_resolution)
        fb = self.net.apply(self.params, fake_high_resolution)
        return jnp.abs(fa - fb).mean()
