"""Data pipeline tests: DIV2K pairing, loader batching/prefetch, MNIST IDX."""

import gzip
import os
import struct

import numpy as np
import pytest
from PIL import Image

from dgm_img_super_resolution_tpu.data.div2k import DIV2KDataset
from dgm_img_super_resolution_tpu.data.loader import DataLoader
from dgm_img_super_resolution_tpu.data.mnist import ArrayDataset, load_mnist, synthetic_mnist


@pytest.fixture
def div2k_dir(tmp_path, rng):
    d = tmp_path / "div2k"
    d.mkdir()
    for i in range(6):
        img = rng.integers(0, 256, (300, 400, 3), dtype=np.uint8)
        Image.fromarray(img).save(d / f"{i:04d}.png")
    return str(d)


def test_div2k_pairs_and_ranges(div2k_dir):
    ds = DIV2KDataset(div2k_dir, scale_factor=4, hr_height=64, hr_width=64)
    assert len(ds) == 6
    s = ds[0]
    assert s["hr"].shape == (64, 64, 3)
    assert s["lr"].shape == (16, 16, 3)
    assert s["lr_up"].shape == (64, 64, 3)
    for k in ("hr", "lr", "lr_up"):
        assert s[k].dtype == np.float32
        assert s[k].min() >= -1.0 - 1e-6 and s[k].max() <= 1.0 + 1e-6


def test_div2k_only_img(div2k_dir):
    ds = DIV2KDataset(div2k_dir, only_img=True)
    img = ds[2]
    assert img.dtype == np.uint8 and img.shape == (300, 400, 3)


def test_div2k_augmentation_crops(div2k_dir):
    ds = DIV2KDataset(div2k_dir, hr_height=64, hr_width=64, data_augmentation=True)
    a, b = ds[0], ds[0]
    # random crops differ between draws
    assert not np.array_equal(a["hr"], b["hr"])


def test_dataloader_batches_and_epochs(div2k_dir):
    ds = DIV2KDataset(div2k_dir, hr_height=32, hr_width=32)
    loader = DataLoader(ds, batch_size=2, num_workers=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["hr"].shape == (2, 32, 32, 3)


def test_dataloader_endless(div2k_dir):
    ds = DIV2KDataset(div2k_dir, hr_height=32, hr_width=32)
    loader = DataLoader(ds, batch_size=2, endless=True)
    it = iter(loader)
    seen = [next(it) for _ in range(7)]  # > one epoch (3 batches)
    assert seen[6]["hr"].shape == (2, 32, 32, 3)


def test_dataloader_tuple_dataset():
    imgs, labels = synthetic_mnist(10)
    loader = DataLoader(ArrayDataset(imgs, labels), batch_size=5, shuffle=False)
    x, y = next(iter(loader))
    assert x.shape == (5, 28, 28) and y.shape == (5,)


def _write_idx(path, arr):
    with gzip.open(path, "wb") as f:
        ndim = arr.ndim
        f.write(struct.pack(">I", (0x08 << 8) | ndim))  # magic: 0x00 0x00 dtype ndim
        f.write(struct.pack(f">{ndim}I", *arr.shape))
        f.write(arr.tobytes())


def test_load_mnist_idx_roundtrip(tmp_path, rng):
    imgs = rng.integers(0, 256, (20, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, (20,)).astype(np.uint8)
    _write_idx(tmp_path / "train-images-idx3-ubyte.gz", imgs)
    _write_idx(tmp_path / "train-labels-idx1-ubyte.gz", labels)
    got_imgs, got_labels = load_mnist(str(tmp_path), "train")
    np.testing.assert_array_equal(got_imgs, imgs)
    np.testing.assert_array_equal(got_labels, labels)


def test_load_mnist_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_mnist(str(tmp_path))
