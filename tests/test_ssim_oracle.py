"""External-oracle validation of the eval-semantics PSNR/SSIM (VERDICT r1
weak #8): ``metrics.psnr_ssim.ssim_eval`` previously asserted its claimed
scikit-image semantics only against itself / closed forms, so an off-by-one
in the window or covariance convention would have passed.

scikit-image is not installed in this environment (and cannot be — zero
egress), so the oracle here is an INDEPENDENT float64 NumPy/SciPy
re-derivation of ``skimage.metrics.structural_similarity``'s documented
algorithm (Wang et al. 2004 as specialised by skimage's defaults:
uniform 7x7 filter via ``scipy.ndimage.uniform_filter``, sample
(N/(N-1)) covariance, (win_size-1)//2 border crop of the full-size map,
per-channel mean), sharing no code with the jax implementation under test.
The hard-coded goldens below pin the oracle's own float64 outputs on a
fixed image pair so any future drift in either side fails loudly.
Reference call site: ``srdiff/model.py:1537-1542``.
"""

from __future__ import annotations

import numpy as np
import pytest
from scipy.ndimage import uniform_filter

from dgm_img_super_resolution_tpu.metrics.measure import Measure
from dgm_img_super_resolution_tpu.metrics.psnr_ssim import ssim_eval


def oracle_ssim_single(x: np.ndarray, y: np.ndarray, data_range: float) -> float:
    """skimage.structural_similarity defaults, one channel, float64."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    win = 7
    ndim = x.ndim
    NP = win**ndim
    cov_norm = NP / (NP - 1)  # use_sample_covariance=True
    filt = lambda a: uniform_filter(a, size=win)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
    pad = (win - 1) // 2
    crop = S[tuple(slice(pad, s - pad) for s in S.shape)]
    return float(crop.mean())


def oracle_ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """multichannel (channel_axis=-1): mean of per-channel SSIMs."""
    if a.ndim == 2:
        return oracle_ssim_single(a, b, data_range)
    return float(
        np.mean(
            [oracle_ssim_single(a[..., c], b[..., c], data_range) for c in range(a.shape[-1])]
        )
    )


def oracle_psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    err = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10.0 * np.log10(data_range**2 / err))


def _image_pair(seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """A deterministic structured pair (gradient + texture vs noisy copy) —
    structured, not iid noise, so window-placement errors actually move the
    score."""
    rng = np.random.default_rng(seed)
    h, w = 96, 80
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (
        127.5
        + 80 * np.sin(xx / 7.0)[..., None] * np.cos(yy / 11.0)[..., None]
        + rng.normal(0, 12, (h, w, 3))
    )
    a = np.clip(base, 0, 255).astype(np.uint8)
    b = np.clip(base + rng.normal(0, 9, (h, w, 3)), 0, 255).astype(np.uint8)
    return a, b


def test_ssim_eval_matches_independent_oracle():
    a, b = _image_pair()
    got = ssim_eval(a, b, data_range=255.0)
    want = oracle_ssim(a, b, 255.0)
    assert got == pytest.approx(want, abs=2e-5), (got, want)


def test_ssim_eval_matches_oracle_grayscale_and_float_range():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    got = ssim_eval(a, b, data_range=1.0)
    want = oracle_ssim(a, b, 1.0)
    assert got == pytest.approx(want, abs=2e-5), (got, want)


def test_measure_psnr_matches_oracle():
    a, b = _image_pair(1)
    got = Measure().psnr(a, b)
    want = oracle_psnr(a, b)
    assert got == pytest.approx(want, abs=1e-3), (got, want)


def test_pinned_goldens():
    """Absolute values pinned from the float64 oracle on the fixed pair —
    guards both implementations against silent convention drift. (Provenance:
    computed by ``oracle_ssim``/``oracle_psnr`` in this file; skimage itself
    is unavailable offline, so the pin certifies agreement with the
    documented algorithm, not with a skimage binary run.)"""
    a, b = _image_pair()
    assert oracle_ssim(a, b) == pytest.approx(GOLDEN_SSIM, abs=1e-9)
    assert oracle_psnr(a, b) == pytest.approx(GOLDEN_PSNR, abs=1e-7)
    assert ssim_eval(a, b) == pytest.approx(GOLDEN_SSIM, abs=2e-5)
    assert Measure().psnr(a, b) == pytest.approx(GOLDEN_PSNR, abs=1e-3)


# pinned from a local float64 oracle run (see test_pinned_goldens docstring)
GOLDEN_SSIM = 0.8829693585590896
GOLDEN_PSNR = 28.9785852238218
