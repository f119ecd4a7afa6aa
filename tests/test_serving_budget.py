"""Serving memory-budget tests: oversized requests must not OOM.

The reference app survives arbitrary uploads only because it resizes every
input to 256² first (``st_app1.py:1583-1591``). This framework SRs at native
size, so a budget guard bounds HBM per device call: big batches dispatch in
equal-shaped sub-batches, and a single huge image auto-routes to tiled
``upscale_large``.
"""

import jax
import numpy as np
import pytest

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.inference import SRDiffPipeline
from dgm_img_super_resolution_tpu.parallel.mesh import make_mesh

TINY = Hparams(
    compute_dtype="float32",
    hidden_size=8,
    rrdb_num_block=3,
    rrdb_num_feat=8,
    timesteps=2,
)


def _pipe(**over):
    hp = TINY.replace(**over)
    # one-device mesh so the per-chip budget is the per-call budget
    mesh = make_mesh("dp=1", devices=jax.devices()[:1])
    return SRDiffPipeline(hp, mesh=mesh, rng=jax.random.PRNGKey(0))


def test_big_batch_dispatches_in_subbatches(monkeypatch):
    # budget = 2 images' worth of 32x32 HR pixels -> batch of 5 must split
    pipe = _pipe(max_native_hr_pixels=2 * 32 * 32)
    calls = []
    orig = SRDiffPipeline.upscale_batch_device

    def spy(self, imgs, *a, **k):
        calls.append(int(np.asarray(imgs).shape[0]))
        return orig(self, imgs, *a, **k)

    monkeypatch.setattr(SRDiffPipeline, "upscale_batch_device", spy)
    lr = np.random.default_rng(0).uniform(-1, 1, (5, 8, 8, 3)).astype(np.float32)
    out = pipe.upscale_batch(lr)
    assert out.shape == (5, 32, 32, 3)
    assert np.isfinite(out).all()
    # top-level call of 5, then equal-shaped sub-batches of 2 (last padded)
    assert calls[0] == 5
    assert calls[1:] == [2, 2, 2]


def test_big_batch_progress_is_monotone_and_complete():
    pipe = _pipe(max_native_hr_pixels=2 * 32 * 32)
    lr = np.random.default_rng(1).uniform(-1, 1, (3, 8, 8, 3)).astype(np.float32)
    seen = []
    pipe.upscale_batch(lr, progress_cb=lambda d, t: seen.append((d, t)))
    assert seen, "progress callback never fired"
    dones = [d for d, _ in seen]
    totals = {t for _, t in seen}
    assert len(totals) == 1
    assert dones == sorted(dones)
    assert seen[-1][0] == seen[-1][1]


def test_huge_single_image_autoroutes_to_tiled(monkeypatch):
    # 16x24 LR -> 64x96 HR (6144 px) over a 4096-px budget; patch=8 tiles
    pipe = _pipe(
        max_native_hr_pixels=4 * 32 * 32,
        infer_patch_size=8,
        infer_patch_overlap=2,
    )
    routed = {}
    orig = SRDiffPipeline.upscale_large

    def spy(self, image, *a, **k):
        routed["patch"] = k.get("patch")
        routed["overlap"] = k.get("overlap")
        return orig(self, image, *a, **k)

    monkeypatch.setattr(SRDiffPipeline, "upscale_large", spy)
    lr = np.random.default_rng(2).uniform(-1, 1, (16, 24, 3)).astype(np.float32)
    sr = pipe.upscale(lr)
    assert routed == {"patch": 8, "overlap": 2}
    assert sr.shape == (64, 96, 3)
    assert np.isfinite(sr).all()


def test_small_image_stays_native(monkeypatch):
    pipe = _pipe(max_native_hr_pixels=4 * 32 * 32)

    def boom(self, *a, **k):  # pragma: no cover - must not be called
        raise AssertionError("tiled path must not engage under budget")

    monkeypatch.setattr(SRDiffPipeline, "upscale_large", boom)
    lr = np.random.default_rng(3).uniform(-1, 1, (8, 8, 3)).astype(np.float32)
    sr = pipe.upscale(lr)
    assert sr.shape == (32, 32, 3)


def test_replicating_batch_budgets_per_chip(monkeypatch):
    """A batch that shard_batch would REPLICATE (n % dp != 0) must be budgeted
    against one chip's limit, then padded up to a shardable size — the ADVICE
    r2 medium finding: the old mesh-scaled budget let a replicated dispatch
    put ~ndev× the per-chip budget on every chip."""
    hp = TINY.replace(max_native_hr_pixels=32 * 32)  # one 32² image per chip
    mesh = make_mesh("dp=4", devices=jax.devices()[:4])
    pipe = SRDiffPipeline(hp, mesh=mesh, rng=jax.random.PRNGKey(0))
    calls = []
    orig = SRDiffPipeline.upscale_batch_device

    def spy(self, imgs, *a, **k):
        calls.append(int(np.asarray(imgs).shape[0]))
        return orig(self, imgs, *a, **k)

    monkeypatch.setattr(SRDiffPipeline, "upscale_batch_device", spy)
    lr = np.random.default_rng(5).uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
    out = pipe.upscale_batch(lr)
    assert out.shape == (2, 32, 32, 3)
    # n=2 on dp=4 would replicate (2 imgs/chip = 2× budget); the guard pads to
    # one sharded call of 4 (1 img/chip = exactly the budget)
    assert calls == [2, 4]


def test_oversized_images_in_batch_route_tiled(monkeypatch):
    """A batch of images each individually over the per-chip budget must not
    dispatch over-budget chunks of 1 — each image routes through the tiled
    path (ADVICE r2 #2)."""
    pipe = _pipe(
        max_native_hr_pixels=4 * 32 * 32,  # 4096 px < one 64×96 output (6144)
        infer_patch_size=8,
        infer_patch_overlap=2,
    )
    tiled = []
    orig = SRDiffPipeline.upscale_large

    def spy(self, image, *a, **k):
        tiled.append(np.asarray(image).shape)
        return orig(self, image, *a, **k)

    monkeypatch.setattr(SRDiffPipeline, "upscale_large", spy)
    lr = np.random.default_rng(6).uniform(-1, 1, (2, 16, 24, 3)).astype(np.float32)
    out = pipe.upscale_batch(lr)
    assert out.shape == (2, 64, 96, 3)
    assert np.isfinite(out).all()
    assert tiled == [(16, 24, 3), (16, 24, 3)]


def test_budget_counts_padded_dims(monkeypatch):
    """per-image pixels are budgeted at the PADDED size the device call runs
    (7×7 LR reflect-pads to 8×8 → 1024 HR px, not 784 — ADVICE r2 #4)."""
    pipe = _pipe(max_native_hr_pixels=1800)
    calls = []
    orig = SRDiffPipeline.upscale_batch_device

    def spy(self, imgs, *a, **k):
        calls.append(int(np.asarray(imgs).shape[0]))
        return orig(self, imgs, *a, **k)

    monkeypatch.setattr(SRDiffPipeline, "upscale_batch_device", spy)
    lr = np.random.default_rng(7).uniform(-1, 1, (2, 7, 7, 3)).astype(np.float32)
    out = pipe.upscale_batch(lr)
    assert out.shape == (2, 28, 28, 3)
    # raw dims (2×784=1568) would fit 1800; padded (2×1024=2048) must split
    assert calls == [2, 1, 1]


def test_budget_zero_disables_guard(monkeypatch):
    pipe = _pipe(max_native_hr_pixels=0)
    calls = []
    orig = SRDiffPipeline.upscale_batch_device

    def spy(self, imgs, *a, **k):
        calls.append(int(np.asarray(imgs).shape[0]))
        return orig(self, imgs, *a, **k)

    monkeypatch.setattr(SRDiffPipeline, "upscale_batch_device", spy)
    lr = np.random.default_rng(4).uniform(-1, 1, (3, 8, 8, 3)).astype(np.float32)
    out = pipe.upscale_batch(lr)
    assert out.shape == (3, 32, 32, 3)
    assert calls == [3]  # single dispatch, no chunking
