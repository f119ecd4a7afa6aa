"""Golden tests for the matmul-formulated resize ops.

Each variant is checked against an *independent* oracle:

- ``torch`` / ``torch_half``: torch.nn.functional.interpolate itself.
- ``pil``: PIL.Image.resize (what torchvision Resize uses on PIL inputs).
- ``matlab``: a naive per-pixel reimplementation of the published MATLAB
  imresize algorithm, written directly from its definition (antialiased
  Keys a=-0.5 kernel, symmetric boundary, renormalised taps).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from dgm_img_super_resolution_tpu.ops.resize import (
    imresize,
    nearest_upsample,
    resize,
    resize_matrix,
)


def _keys_cubic(x, a):
    x = abs(x)
    if x <= 1:
        return (a + 2) * x**3 - (a + 3) * x**2 + 1
    if x <= 2:
        return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
    return 0.0


def _matlab_oracle_1d(signal, out_len):
    """Direct (slow) MATLAB imresize along one axis, from the spec."""
    in_len = len(signal)
    scale = out_len / in_len
    if scale < 1.0:
        kw = 4.0 / scale
        kern = lambda x: scale * _keys_cubic(scale * x, -0.5)
    else:
        kw = 4.0
        kern = lambda x: _keys_cubic(x, -0.5)
    out = np.zeros(out_len)
    for i in range(out_len):
        # 1-indexed output sample i+1 maps to input coordinate u (1-indexed)
        u = (i + 1) / scale + 0.5 * (1 - 1 / scale)
        left = math.floor(u - kw / 2)
        taps = int(math.ceil(kw)) + 2
        ws, vs = [], []
        for t in range(taps):
            j = left + t  # 1-indexed input tap
            w = kern(u - j)
            # symmetric boundary: reflect without repeating the edge sample
            jj = j - 1
            period = 2 * in_len
            jj = jj % period
            if jj >= in_len:
                jj = period - 1 - jj
            ws.append(w)
            vs.append(signal[jj])
        ws = np.array(ws)
        out[i] = float(np.dot(ws / ws.sum(), np.array(vs)))
    return out


@pytest.mark.parametrize("in_len,out_len", [(64, 256), (256, 64), (100, 37), (37, 100)])
def test_matlab_matrix_matches_direct_oracle(in_len, out_len, rng):
    sig = rng.standard_normal(in_len)
    mat = resize_matrix(in_len, out_len, "matlab", dtype="float64")
    got = mat @ sig
    want = _matlab_oracle_1d(sig, out_len)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_matlab_imresize_2d_uint8_roundtrip(rng):
    img = rng.integers(0, 256, size=(48, 40, 3), dtype=np.uint8)
    out = imresize(img, scale=0.25)
    assert out.shape == (12, 10, 3)
    assert out.dtype == np.uint8
    up = imresize(img.astype(np.float64) / 255.0, scale=4.0)
    assert up.shape == (192, 160, 3)
    assert up.dtype == np.float64


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("shape", [((17, 23), (51, 69)), ((64, 64), (256, 256))])
def test_torch_bicubic_parity(align, shape, rng):
    (h, w), (oh, ow) = shape
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=(oh, ow), mode="bicubic", align_corners=align)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize(x, (oh, ow), variant="torch" if align else "torch_half"))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize("shape", [((100, 80), (256, 256)), ((256, 256), (64, 64))])
def test_pil_bicubic_parity(shape, rng):
    # Primary oracle: torch antialiased bicubic == PIL's algorithm in float.
    (h, w), (oh, ow) = shape
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=(oh, ow),
        mode="bicubic",
        align_corners=False,
        antialias=True,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize(x, (oh, ow), variant="pil"))
    np.testing.assert_allclose(got, want, atol=2e-4)

    # Sanity vs real PIL on uint8: PIL clips each separable pass to uint8, so
    # only non-overshooting pixels can match exactly; check bulk agreement.
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    pil = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BICUBIC)).astype(np.float64)
    ours = np.clip(np.asarray(resize(img.astype(np.float32), (oh, ow), variant="pil")), 0, 255)
    frac_close = (np.abs(ours - pil) <= 1.0).mean()
    assert frac_close > 0.95


def test_nearest_upsample_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
    got = np.asarray(nearest_upsample(x, 2))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), atol=0)
