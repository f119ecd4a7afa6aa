"""MNIST for the educational models (GAN/DCGAN/WGAN-GP/AE/VAE/DDPM).

The reference pulls MNIST through torchvision (``notebooks/simple_gan.ipynb``
cell 9 etc.); this environment has no torchvision and no network egress, so:

- :func:`load_mnist` reads standard IDX files (``train-images-idx3-ubyte[.gz]``
  …) from a local directory when available;
- :func:`synthetic_mnist` generates a deterministic digit-like dataset
  (anti-aliased strokes per class) so training demos and tests run hermetically.

Images come back as NHWC float32 in [-1, 1] (tanh-output convention of the
reference GAN notebooks), optionally resized to 32×32 or 64×64 for the
conv models.
"""

from __future__ import annotations

import gzip
import os
import struct

import numpy as np

from dgm_img_super_resolution_tpu.ops.resize import resize_matrix


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        shape = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


def load_mnist(data_dir: str, split: str = "train") -> tuple[np.ndarray, np.ndarray]:
    """Read IDX MNIST files → (images uint8 (N,28,28), labels (N,))."""
    prefix = "train" if split == "train" else "t10k"
    for ext in ("", ".gz"):
        img_path = os.path.join(data_dir, f"{prefix}-images-idx3-ubyte{ext}")
        lbl_path = os.path.join(data_dir, f"{prefix}-labels-idx1-ubyte{ext}")
        if os.path.exists(img_path) and os.path.exists(lbl_path):
            return _read_idx(img_path), _read_idx(lbl_path)
    raise FileNotFoundError(f"MNIST IDX files not found under {data_dir}")


def synthetic_mnist(n: int = 4096, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic digit-like 28×28 grayscale images (uint8) with labels.

    Each class is a distinct geometric glyph with per-sample jitter — enough
    structure for GAN/VAE sanity training without any download.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32)
    images = np.zeros((n, 28, 28), np.float32)
    labels = rng.integers(0, 10, n).astype(np.int64)
    for i in range(n):
        c = int(labels[i])
        cx = 14 + rng.normal(0, 1.5)
        cy = 14 + rng.normal(0, 1.5)
        r = 6 + c * 0.5 + rng.normal(0, 0.5)
        if c % 3 == 0:  # ring
            d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
            img = np.exp(-((d - r) ** 2) / 2.0)
        elif c % 3 == 1:  # bar at class-dependent angle
            theta = c * np.pi / 10 + rng.normal(0, 0.1)
            d = np.abs((xx - cx) * np.sin(theta) - (yy - cy) * np.cos(theta))
            mask = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2) < r + 3
            img = np.exp(-(d**2) / 3.0) * mask
        else:  # filled blob
            d = np.sqrt((xx - cx) ** 2 + ((yy - cy) * (1 + c / 10)) ** 2)
            img = 1.0 / (1.0 + np.exp(2.0 * (d - r * 0.7)))
        img = img + rng.normal(0, 0.02, img.shape)
        images[i] = np.clip(img, 0, 1)
    return (images * 255).astype(np.uint8), labels


def to_model_input(images: np.ndarray, size: int = 28) -> np.ndarray:
    """uint8 (N,28,28) → float32 NHWC [-1,1], optionally resized (e.g. 32/64
    for DCGAN) via the antialiased bicubic matmul path."""
    x = images.astype(np.float32) / 127.5 - 1.0
    x = x[..., None]
    if size != images.shape[1]:
        m = resize_matrix(images.shape[1], size, "pil", dtype="float32")
        x = np.einsum("oh,nhwc->nowc", m, x)
        x = np.einsum("pw,nowc->nopc", m, x)
    return x


class ArrayDataset:
    """Wrap (images, labels) arrays as an indexable dataset for DataLoader."""

    def __init__(self, images: np.ndarray, labels: np.ndarray | None = None):
        self.images = images
        self.labels = labels

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int):
        if self.labels is None:
            return self.images[int(idx)]
        return self.images[int(idx)], self.labels[int(idx)]
