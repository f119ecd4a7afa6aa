"""End-to-end SR quality measurement.

Equivalent of the reference ``Measure`` (``srdiff/model.py:1499-1542``):
``measure(imgA, imgB, img_lr, sr_scale) -> {psnr, ssim, lpips, lr_psnr}``.

- inputs are HWC images, either uint8 [0,255] or float [-1,1] (the framework
  convention; the reference takes CHW tensors and converts identically);
- ``psnr``/``ssim`` use scikit-image semantics on uint8 (data_range=255);
- ``lr_psnr`` downscales the SR output with MATLAB-exact bicubic
  (``ops.resize.imresize``) and compares against the LR input — the
  consistency metric;
- ``lpips`` uses the AlexNet-LPIPS network when weights are available (see
  ``metrics/lpips.py``); otherwise reports ``nan`` rather than failing, since
  this environment has no network egress to fetch pretrained weights.
"""

from __future__ import annotations

import numpy as np

from dgm_img_super_resolution_tpu.metrics.psnr_ssim import psnr, ssim_eval
from dgm_img_super_resolution_tpu.ops.image import pm1_to_uint8
from dgm_img_super_resolution_tpu.ops.resize import imresize


def _to_uint8_hwc(img) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return pm1_to_uint8(img)


class Measure:
    def __init__(self, lpips_weights: str | None = None):
        self._lpips = None
        try:
            from dgm_img_super_resolution_tpu.metrics.lpips import LPIPS

            self._lpips = LPIPS.maybe_create(lpips_weights)
        except Exception:
            self._lpips = None

    def measure(self, img_a, img_b, img_lr, sr_scale: int) -> dict[str, float]:
        """img_a: SR output; img_b: HR ground truth; img_lr: LR input."""
        a = _to_uint8_hwc(img_a)
        b = _to_uint8_hwc(img_b)
        lr = _to_uint8_hwc(img_lr)
        res = {
            "psnr": self.psnr(a, b),
            "ssim": self.ssim(a, b),
            "lpips": self.lpips(a, b),
            "lr_psnr": self.lr_psnr(a, lr, sr_scale),
        }
        return res

    def psnr(self, img_a, img_b) -> float:
        return float(psnr(np.asarray(img_a, np.float32), np.asarray(img_b, np.float32), 255.0))

    def ssim(self, img_a, img_b) -> float:
        return ssim_eval(img_a, img_b, data_range=255.0)

    def lr_psnr(self, img_a, img_lr, sr_scale: int) -> float:
        down = imresize(np.asarray(img_a, np.uint8), scale=1.0 / sr_scale)
        return self.psnr(down, img_lr)

    def lpips(self, img_a, img_b) -> float:
        if self._lpips is None:
            return float("nan")
        return float(self._lpips(img_a, img_b))
