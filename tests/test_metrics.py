"""Metric tests: PSNR closed-form, SSIM properties + parity between the two
variants' expected behaviours, Measure end-to-end, ImgMerger stitching."""

import jax
import jax.numpy as jnp
import numpy as np

from dgm_img_super_resolution_tpu.metrics import Measure, SSIM, psnr, ssim, ssim_eval
from dgm_img_super_resolution_tpu.ops.image import ImgMerger, extract_patches, merge_patches, pm1_to_uint8


def test_psnr_closed_form(rng):
    a = rng.integers(0, 256, (32, 32, 3)).astype(np.float32)
    b = np.clip(a + 10.0, 0, 255)
    mse = np.mean((a - b) ** 2)
    want = 10 * np.log10(255.0**2 / mse)
    assert abs(float(psnr(a, b)) - want) < 1e-3


def test_ssim_loss_variant_identity_and_range(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    assert float(ssim(x, x)) > 0.9999
    y = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    v = float(ssim(x, y))
    assert -1.0 <= v < 0.9
    # SSIM module surface
    mod = SSIM(window_size=11)
    assert abs(float(mod(x, y)) - v) < 1e-6


def test_ssim_loss_is_differentiable(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32))
    g = jax.grad(lambda a: 1.0 - ssim(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_ssim_eval_skimage_semantics(rng):
    # smooth base image: SSIM is sensitive to noise only when local variance
    # is small, so build a gradient rather than uniform noise
    yy, xx = np.mgrid[0:64, 0:64]
    a = np.stack([yy * 2.0, xx * 2.0, (yy + xx) * 1.0], axis=-1)
    assert ssim_eval(a, a) > 0.9999
    noisy = np.clip(a + rng.normal(0, 20, a.shape), 0, 255)
    v = ssim_eval(a, noisy)
    assert 0.05 < v < 0.95
    noisier = np.clip(a + rng.normal(0, 60, a.shape), 0, 255)
    assert ssim_eval(a, noisier) < v


def test_measure_keys_and_lr_psnr(rng):
    m = Measure()
    hr = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    # construct LR via the same MATLAB bicubic the metric uses → high lr_psnr
    from dgm_img_super_resolution_tpu.ops.resize import imresize

    lr = imresize(hr, scale=0.25)
    sr = np.clip(hr.astype(np.int32) + rng.integers(-5, 6, hr.shape), 0, 255).astype(np.uint8)
    res = m.measure(sr, hr, lr, sr_scale=4)
    assert set(res) == {"psnr", "ssim", "lpips", "lr_psnr"}
    assert res["psnr"] > 30
    assert res["lr_psnr"] > res["psnr"] - 10
    assert np.isnan(res["lpips"])  # no pretrained weights in this env


def test_pm1_uint8_roundtrip():
    x = np.array([-1.0, -0.5, 0.0, 0.5, 1.0])
    u = pm1_to_uint8(x)
    assert u.tolist() == [0, 64, 128, 191, 255]  # round-half-even at 63.75→64, 191.25→191


def test_extract_merge_patches_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 3)).astype(np.float32))
    patches, grid = extract_patches(x, 8)
    assert patches.shape == (2 * 2 * 3, 8, 8, 3)
    back = merge_patches(patches, grid, n=2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


def test_img_merger_stitches_and_calls_eval(rng):
    full = rng.integers(0, 255, (8, 12, 3)).astype(np.uint8)
    calls = {}

    def eval_fn(img):
        calls["img"] = img
        return {"ok": True}

    merger = ImgMerger(eval_fn)
    out = None
    for x in range(2):
        for y in range(3):
            patch = full[x * 4 : (x + 1) * 4, y * 4 : (y + 1) * 4]
            out = merger.push([patch], (x, y), (2, 3))
    assert out == {"ok": True}
    np.testing.assert_array_equal(calls["img"], full)


def test_tile_positions_cover_and_right_align():
    from dgm_img_super_resolution_tpu.ops.image import tile_positions

    assert tile_positions(16, 8, 8) == [0, 8]
    assert tile_positions(20, 8, 6) == [0, 6, 12]
    assert tile_positions(21, 8, 6) == [0, 6, 12, 13]  # right-aligned tail
    assert tile_positions(6, 8, 8) == [0]


def test_overlap_tiling_exact_for_local_sr(rng):
    """Feathered merge is exact when per-tile SR equals whole-image SR on the
    overlap (nearest-neighbour upsample is local → identical content, so the
    normalised blend must reconstruct it bit-for-bit up to fp rounding)."""
    import jax.numpy as jnp

    from dgm_img_super_resolution_tpu.ops.image import extract_tiles, merge_tiles
    from dgm_img_super_resolution_tpu.ops.resize import nearest_upsample

    x = jnp.asarray(rng.uniform(-1, 1, (1, 20, 28, 3)).astype(np.float32))
    scale, patch, overlap = 4, 8, 3
    tiles, coords = extract_tiles(x, patch, overlap)
    sr_tiles = nearest_upsample(tiles, scale)
    out = merge_tiles(sr_tiles, coords, (20 * scale, 28 * scale), scale, overlap, n=1)
    ref = nearest_upsample(x, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
