"""PSNR and SSIM, jit-friendly NHWC implementations.

Two SSIMs exist on purpose, mirroring the reference's two call sites:

- :func:`ssim` / :class:`SSIM` — the *training-loss* SSIM (reference
  ``srdiff/model.py:151-222``): 11×11 gaussian window (σ=1.5) depthwise
  conv, zero ("same") padding, inputs remapped [-1,1]→[0,1], population
  (biased) covariance. Differentiable; used for ``loss_type='ssim'`` and the
  RRDB aux loss.
- :func:`ssim_eval` — the *evaluation* SSIM with scikit-image semantics
  (uniform 7×7 filter, sample (unbiased) covariance, crop-valid borders,
  channel-averaged), matching what the reference's ``Measure`` computes via
  ``skimage.metrics.structural_similarity`` (``model.py:1537-1539``).

Both are expressed as depthwise convolutions → XLA maps them onto the conv
units and fuses the elementwise SSIM map.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio (skimage-compatible: MSE over all elements)."""
    a = jnp.asarray(a, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    b = jnp.asarray(b, a.dtype)
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10((data_range**2) / mse)


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise(x: jnp.ndarray, win: jnp.ndarray, padding) -> jnp.ndarray:
    """NHWC depthwise conv with an identical window per channel."""
    c = x.shape[-1]
    k = win[:, :, None, None] * jnp.ones((1, 1, 1, c), win.dtype)  # HWIO, I=1
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
    remap_pm1: bool = True,
) -> jnp.ndarray:
    """Gaussian-window SSIM over NHWC batches (training-loss variant).

    ``remap_pm1`` applies the reference's [-1,1]→[0,1] remap
    (``model.py:197-198``); C1/C2 assume a [0,1] range.
    """
    if remap_pm1:
        img1 = img1 * 0.5 + 0.5
        img2 = img2 * 0.5 + 0.5
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    win = jnp.asarray(_gaussian_window(window_size, 1.5))
    pad = window_size // 2
    padding = ((pad, pad), (pad, pad))
    mu1 = _depthwise(img1, win, padding)
    mu2 = _depthwise(img2, win, padding)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise(img1 * img1, win, padding) - mu1_sq
    sigma2_sq = _depthwise(img2 * img2, win, padding) - mu2_sq
    sigma12 = _depthwise(img1 * img2, win, padding) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


class SSIM:
    """Callable matching the reference ``SSIM`` module's constructor surface."""

    def __init__(self, window_size: int = 11, size_average: bool = True):
        self.window_size = window_size
        self.size_average = size_average

    def __call__(self, img1, img2):
        return ssim(img1, img2, self.window_size, self.size_average)


def ssim_eval(
    a,
    b,
    data_range: float = 255.0,
    win_size: int = 7,
) -> float:
    """scikit-image-compatible SSIM (``structural_similarity``) on HWC or HW
    arrays: uniform filter, sample covariance (N/(N-1)), valid-border crop,
    channel mean. Used by :class:`~..metrics.measure.Measure` for eval parity.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    x = a[None]
    y = b[None]
    win = jnp.full((win_size, win_size), 1.0 / (win_size * win_size), jnp.float32)
    ux = _depthwise(x, win, "VALID")
    uy = _depthwise(y, win, "VALID")
    uxx = _depthwise(x * x, win, "VALID")
    uyy = _depthwise(y * y, win, "VALID")
    uxy = _depthwise(x * y, win, "VALID")
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    # skimage computes the mean over a further-cropped map: it pads the valid
    # map back and crops (win_size-1)//2 on each side of the *original* grid,
    # which equals the full valid map mean. Channel dim is averaged last.
    return float(s.mean())
