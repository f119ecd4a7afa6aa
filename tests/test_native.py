"""Native C++ imageops: build, load, and parity with the NumPy oracle."""

import numpy as np
import pytest

from dgm_img_super_resolution_tpu import native
from dgm_img_super_resolution_tpu.ops.resize import imresize

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build native imageops"
)


@pytest.mark.parametrize("scale", [0.25, 0.5, 2.0, 1.7, 0.37])
def test_native_resize_f64_matches_numpy_oracle(rng, scale):
    img = rng.uniform(0, 1, (37, 53, 3))
    ref = imresize(img, scale=scale, use_native=False)
    out = imresize(img, scale=scale, use_native=True)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_allclose(out, ref, atol=1e-12)


@pytest.mark.parametrize("scale", [0.25, 4.0])
def test_native_resize_u8_matches_numpy_oracle(rng, scale):
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    ref = imresize(img, scale=scale, use_native=False)
    out = imresize(img, scale=scale, use_native=True)
    assert out.dtype == np.uint8
    # rounding-boundary pixels may differ by 1 LSB in rare half-way cases
    assert np.mean(np.abs(out.astype(int) - ref.astype(int)) > 1) == 0.0
    assert np.mean(out != ref) < 0.005


def test_native_resize_2d_input(rng):
    img = rng.uniform(0, 255, (20, 20))
    out = imresize(img, sizes=(10, 15), use_native=True)
    ref = imresize(img, sizes=(10, 15), use_native=False)
    assert out.shape == (10, 15)
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_native_u8_pm1_roundtrip(rng):
    arr = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    f = native.u8_to_pm1(arr)
    assert f.dtype == np.float32 and f.min() >= -1.0 and f.max() <= 1.0
    back = native.pm1_to_u8(f)
    np.testing.assert_array_equal(back, arr)
    # matches the pure-NumPy definition exactly
    np.testing.assert_allclose(f, arr.astype(np.float32) / 127.5 - 1.0, atol=0)


def test_default_imresize_routes_to_native(rng):
    img = rng.uniform(0, 1, (16, 16, 3))
    out_auto = imresize(img, scale=0.5)
    out_native = imresize(img, scale=0.5, use_native=True)
    np.testing.assert_array_equal(out_auto, out_native)
