"""Image range conversion and patch tiling ops.

Covers the reference's value-range plumbing (uint8 HWC ↔ [-1, 1] CHW tensors,
``model.py:1516-1522`` / ``model.py:1545-1558``) and its ``ImgMerger``
patch-stitching evaluator (``model.py:108-145``), re-expressed for NHWC
arrays and batched patch grids so large-image eval can shard patches over a
device mesh.

The framework convention is the model stack's own self-consistent [-1, 1]
range (the reference app's ImageNet-normalisation mismatch at
``st_app1.py:1583-1591`` is a documented defect we do not replicate).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def normalize_to_pm1(x: jnp.ndarray) -> jnp.ndarray:
    """[0, 1] float -> [-1, 1]."""
    return x * 2.0 - 1.0


def uint8_to_pm1(x) -> jnp.ndarray:
    """uint8 [0, 255] -> float32 [-1, 1]."""
    return jnp.asarray(x, jnp.float32) / 127.5 - 1.0


def pm1_to_uint8(x) -> np.ndarray:
    """[-1, 1] float -> uint8 [0, 255] with round-half-to-even (matches the
    reference's ``np.round`` path in ``Measure.measure``, model.py:1516-1522).
    """
    y = (np.asarray(x, dtype=np.float64) + 1.0) * 127.5
    return np.round(np.clip(y, 0, 255)).astype(np.uint8)


def extract_patches(
    x: jnp.ndarray, patch: int, stride: int | None = None
) -> tuple[jnp.ndarray, tuple[int, int]]:
    """Split NHWC into a grid of patches.

    Returns ``(patches, (gy, gx))`` where patches is ``(N*gy*gx, patch,
    patch, C)``. H and W must be divisible by the stride grid; callers pad
    first. With ``stride == patch`` (the default) this is a pure reshape —
    free on TPU.
    """
    stride = stride or patch
    n, h, w, c = x.shape
    if stride == patch:
        gy, gx = h // patch, w // patch
        y = x.reshape(n, gy, patch, gx, patch, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n * gy * gx, patch, patch, c)
        return y, (gy, gx)
    gy = (h - patch) // stride + 1
    gx = (w - patch) // stride + 1
    rows = []
    for iy in range(gy):
        for ix in range(gx):
            rows.append(x[:, iy * stride : iy * stride + patch, ix * stride : ix * stride + patch, :])
    return jnp.concatenate(rows, axis=0), (gy, gx)


def merge_patches(patches: jnp.ndarray, grid: tuple[int, int], n: int = 1) -> jnp.ndarray:
    """Inverse of :func:`extract_patches` for the non-overlapping case."""
    gy, gx = grid
    _, p, _, c = patches.shape
    y = patches.reshape(n, gy, gx, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, gy * p, gx * p, c)


def tile_positions(length: int, patch: int, stride: int) -> list[int]:
    """Start offsets covering [0, length) with ``patch``-sized tiles at
    ``stride``; the final tile is right-aligned so the edge is always covered."""
    if length <= patch:
        return [0]
    pos = list(range(0, length - patch + 1, stride))
    if pos[-1] != length - patch:
        pos.append(length - patch)
    return pos


def extract_tiles(
    x: jnp.ndarray, patch: int, overlap: int = 0
) -> tuple[jnp.ndarray, list[tuple[int, int]]]:
    """Split NHWC into overlapping tiles. Returns ``(tiles, coords)`` with
    tiles ``(N*T, patch, patch, C)`` and coords the (y, x) start offsets."""
    n, h, w, _ = x.shape
    stride = patch - overlap
    assert stride > 0, "overlap must be < patch"
    ys = tile_positions(h, patch, stride)
    xs = tile_positions(w, patch, stride)
    coords = [(y, xx) for y in ys for xx in xs]
    tiles = jnp.concatenate(
        [x[:, y : y + patch, xx : xx + patch, :] for y, xx in coords], axis=0
    )
    return tiles, coords


def _feather(length: int, ramp: int) -> np.ndarray:
    """1-D blend window: linear ramps of ``ramp`` samples at both ends
    (minimum weight 1/(ramp+1) > 0 so sum-normalisation stays well-defined
    at image borders), flat 1 in the interior."""
    w = np.ones(length, np.float32)
    if ramp > 0:
        r = (np.arange(1, min(ramp, length) + 1, dtype=np.float32)) / (ramp + 1)
        w[: len(r)] = np.minimum(w[: len(r)], r)
        w[-len(r):] = np.minimum(w[-len(r):], r[::-1])
    return w


def merge_tiles(
    tiles: jnp.ndarray,
    coords: list[tuple[int, int]],
    out_hw: tuple[int, int],
    scale: int = 1,
    overlap: int = 0,
    n: int = 1,
) -> jnp.ndarray:
    """Feather-blended inverse of :func:`extract_tiles` after per-tile ×scale
    SR: overlapping regions blend with linear ramps (weights sum-normalised),
    eliminating tile seams. ``coords`` are LR offsets; output is HR."""
    t, p, _, c = tiles.shape
    n_tiles = len(coords)
    assert t == n_tiles * n
    oh, ow = out_hw
    win = _feather(p, overlap * scale)
    w2 = jnp.asarray(np.outer(win, win))[None, :, :, None]
    acc = jnp.zeros((n, oh, ow, c), tiles.dtype)
    wacc = jnp.zeros((n, oh, ow, 1), tiles.dtype)
    for i, (y, xx) in enumerate(coords):
        tile = tiles[i * n : (i + 1) * n] * w2
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (0, y * scale, xx * scale, 0), (n, p, p, c)) + tile,
            (0, y * scale, xx * scale, 0),
        )
        wacc = jax.lax.dynamic_update_slice(
            wacc,
            jax.lax.dynamic_slice(wacc, (0, y * scale, xx * scale, 0), (n, p, p, 1)) + w2,
            (0, y * scale, xx * scale, 0),
        )
    return acc / wacc


class ImgMerger:
    """Accumulate spatial patches by grid location; run ``eval_fn`` on the
    stitched full images once every location has arrived.

    API-compatible with reference ``ImgMerger`` (``model.py:108-145``): each
    ``push(imgs, loc, loc_bdr)`` supplies one patch per image-slot at grid
    location ``loc``; when the ``loc_bdr`` grid is complete, returns
    ``eval_fn(*stitched_images)``. Patches here are HWC (NHWC-native
    framework) rather than the reference's CHW.
    """

    def __init__(self, eval_fn):
        self.eval_fn = eval_fn
        self.clear()

    def clear(self) -> None:
        self.loc2imgs: dict[str, list] = {}
        self.max_x = 0
        self.max_y = 0

    def push(self, imgs, loc, loc_bdr):
        self.max_x, self.max_y = loc_bdr
        x, y = loc
        self.loc2imgs[f"{x},{y}"] = imgs
        if len(self.loc2imgs) == self.max_x * self.max_y:
            return self.compute()
        return None

    def compute(self):
        stitched = []
        num_slots = len(self.loc2imgs["0,0"])
        for i in range(num_slots):
            rows = []
            for x in range(self.max_x):
                row = [np.asarray(self.loc2imgs[f"{x},{y}"][i]) for y in range(self.max_y)]
                rows.append(np.concatenate(row, axis=1))  # along W (HWC)
            stitched.append(np.concatenate(rows, axis=0))  # along H
        self.clear()
        return self.eval_fn(*stitched)
