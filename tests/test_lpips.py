"""Golden tests for LPIPS (AlexNet backbone) and the VGG19 perceptual path.

The pretrained weights can't be downloaded here (zero egress), so the oracle
is an independently written *torch* forward of the published LPIPS / VGG19
formulations, seeded with random weights stored in the upstream state_dict
layouts (`lpips` package keys / torchvision `features.N` keys). The jax side
loads the same weights through the converters — a wrong rule, a dropped key,
or a forward-math mismatch fails these tests (VERDICT r1 missing #2).

Reference use: ``srdiff/model.py:1501,1530-1535`` (lpips.LPIPS(net='alex')),
``model.py:225-269`` (VGG19 feature_layer=34 perceptual loss).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from dgm_img_super_resolution_tpu.ckpt.torch_import import (
    convert_lpips_state_dict,
    import_lpips,
)
from dgm_img_super_resolution_tpu.metrics.lpips import LPIPS, _LPIPSNet
from dgm_img_super_resolution_tpu.metrics.measure import Measure
from dgm_img_super_resolution_tpu.metrics.perceptual import PerceptualLoss

# (conv name idx in torchvision alexnet.features, out_ch, in_ch, k, stride, pad)
_ALEX_CONVS = [
    (0, 64, 3, 11, 4, 2),
    (3, 192, 64, 5, 1, 2),
    (6, 384, 192, 3, 1, 1),
    (8, 256, 384, 3, 1, 1),
    (10, 256, 256, 3, 1, 1),
]
_SLICE_OF_IDX = {0: "slice1", 3: "slice2", 6: "slice3", 8: "slice4", 10: "slice5"}


def _make_lpips_state_dict(seed: int = 0) -> dict:
    g = torch.Generator().manual_seed(seed)
    sd = {
        "scaling_layer.shift": torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1),
        "scaling_layer.scale": torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1),
    }
    for idx, oc, ic, k, _, _ in _ALEX_CONVS:
        sd[f"net.{_SLICE_OF_IDX[idx]}.{idx}.weight"] = torch.randn(oc, ic, k, k, generator=g) * 0.05
        sd[f"net.{_SLICE_OF_IDX[idx]}.{idx}.bias"] = torch.randn(oc, generator=g) * 0.05
    for i, (_, oc, *_rest) in enumerate(_ALEX_CONVS):
        # lin heads are non-negative in the real model (forced by a ReLU-like
        # clamp at training); use abs to stay in-distribution
        sd[f"lin{i}.model.1.weight"] = torch.randn(1, oc, 1, 1, generator=g).abs() * 0.1
    return sd


def _torch_lpips_forward(sd: dict, a: torch.Tensor, b: torch.Tensor) -> float:
    """Independent torch oracle of the LPIPS forward (lpips/__init__.py math):
    scale inputs, AlexNet relu taps, channel-unit-normalise, squared diff,
    1x1 lin head, spatial mean, sum over taps."""
    shift, scale = sd["scaling_layer.shift"], sd["scaling_layer.scale"]

    def feats(x):
        x = (x - shift) / scale
        taps = []
        for li, (idx, _, _, _, s, p) in enumerate(_ALEX_CONVS):
            name = f"net.{_SLICE_OF_IDX[idx]}.{idx}"
            x = F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"], stride=s, padding=p)
            x = F.relu(x)
            taps.append(x)
            if li in (0, 1):  # maxpool after slice1 and slice2 taps
                x = F.max_pool2d(x, 3, stride=2)
        return taps

    fa, fb = feats(a), feats(b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / (xa.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        nb = xb / (xb.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        w = F.conv2d(d, sd[f"lin{i}.model.1.weight"])
        total = total + w.mean(dim=(2, 3)).sum()
    return float(total)


def test_lpips_matches_torch_oracle(rng):
    sd = _make_lpips_state_dict()
    params = convert_lpips_state_dict(sd)
    scorer = LPIPS(params)
    a = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), -1, 1).astype(np.float32)
    want = _torch_lpips_forward(sd, torch.from_numpy(a), torch.from_numpy(b))
    got = float(scorer(np.transpose(a[0], (1, 2, 0)), np.transpose(b[0], (1, 2, 0))))
    assert abs(got - want) < 1e-4, (got, want)
    assert abs(float(scorer(np.transpose(a[0], (1, 2, 0)), np.transpose(a[0], (1, 2, 0))))) < 1e-8


def test_lpips_converter_strictness():
    sd = _make_lpips_state_dict()
    sd["net.slice9.99.weight"] = torch.zeros(1)
    with pytest.raises(ValueError):
        convert_lpips_state_dict(sd)
    sd2 = _make_lpips_state_dict()
    del sd2["lin3.model.1.weight"]
    with pytest.raises(ValueError, match="missing"):
        convert_lpips_state_dict(sd2)


def test_measure_lpips_from_torch_file(tmp_path, rng):
    sd = _make_lpips_state_dict()
    path = str(tmp_path / "lpips_alex.pt")
    torch.save(sd, path)
    m = Measure(lpips_weights=path)
    img_a = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    v = m.lpips(img_a, img_b)
    assert np.isfinite(v)
    ta = torch.from_numpy((img_a.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1))[None]
    tb = torch.from_numpy((img_b.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1))[None]
    want = _torch_lpips_forward(sd, ta, tb)
    assert abs(v - want) < 1e-4
    # import_lpips surface used by docs
    assert abs(float(import_lpips(path)(img_a, img_b)) - want) < 1e-4


# ------------------------------------------------------------------- VGG19
_VGG_PLAN = [(64, 0, 3), (64, 2, 64), (128, 5, 64), (128, 7, 128),
             (256, 10, 128), (256, 12, 256), (256, 14, 256), (256, 16, 256),
             (512, 19, 256), (512, 21, 512), (512, 23, 512), (512, 25, 512),
             (512, 28, 512), (512, 30, 512), (512, 32, 512), (512, 34, 512)]
_VGG_POOL_BEFORE = {5, 10, 19, 28}  # torchvision indices 4, 9, 18, 27 are pools


def _make_vgg_state_dict(seed: int = 1) -> dict:
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for oc, idx, ic in _VGG_PLAN:
        sd[f"features.{idx}.weight"] = torch.randn(oc, ic, 3, 3, generator=g) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn(oc, generator=g) * 0.05
    return sd


def _torch_vgg_forward(sd: dict, x: torch.Tensor) -> torch.Tensor:
    """Independent torch oracle of VGGFeatureExtractor (model.py:225-252):
    [-1,1]-shifted ImageNet norm, features[:35], last conv pre-ReLU."""
    mean = torch.tensor([0.485 - 1.0, 0.456 - 1.0, 0.406 - 1.0]).view(1, 3, 1, 1)
    std = torch.tensor([0.229 * 2.0, 0.224 * 2.0, 0.225 * 2.0]).view(1, 3, 1, 1)
    x = (x - mean) / std
    for i, (oc, idx, ic) in enumerate(_VGG_PLAN):
        if idx in _VGG_POOL_BEFORE:
            x = F.max_pool2d(x, 2, stride=2)
        x = F.conv2d(x, sd[f"features.{idx}.weight"], sd[f"features.{idx}.bias"], padding=1)
        if i != len(_VGG_PLAN) - 1:
            x = F.relu(x)
    return x


def test_vgg19_perceptual_matches_torch_oracle(rng):
    sd = _make_vgg_state_dict()
    loss = PerceptualLoss.from_torch_vgg19(sd)
    a = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    fa = _torch_vgg_forward(sd, torch.from_numpy(a))
    fb = _torch_vgg_forward(sd, torch.from_numpy(b))
    want = float((fa - fb).abs().mean())
    ja = jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    jb = jnp.asarray(np.transpose(b, (0, 2, 3, 1)))
    got = float(loss(ja, jb))
    assert abs(got - want) < 1e-4 + 1e-5 * abs(want), (got, want)
    # feature-level agreement too (activations, not just the scalar)
    feats = loss.net.apply(loss.params, ja)
    # 16 chained f32 convs accumulate reduction-order noise (~1e-3 relative
    # between XLA and torch); a wrong layer/norm would be O(1) off
    np.testing.assert_allclose(
        np.asarray(feats), fa.permute(0, 2, 3, 1).numpy(), atol=1e-2, rtol=3e-3
    )
