"""Fused UNet-tail kernel (ops/pallas/tail_fuse.py): exactness vs the XLA
reference composition, UNet routing parity, gradient path, and the
lane-padded-carry output mode — all in interpreter mode on CPU (the same
strategy as tests/test_block_chain.py; the perf A/B lives in
tools/unet_scan_bench.py and docs/DESIGN.md "Fused tail kernel")."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgm_img_super_resolution_tpu.models import layers
from dgm_img_super_resolution_tpu.ops.pallas.tail_fuse import (
    tail_fuse,
    tail_reference,
)


def _mk(rng, h, w, c=64, cout=4, b=2):
    r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731
    return (
        r(b, h, w, c),
        r(4, 4, c, c) * 0.05,
        r(c) * 0.1,
        r(3, 3, c, c) * 0.05,
        r(c) * 0.1,
        r(c, cout) * 0.1,
        r(cout) * 0.1,
    )


@pytest.mark.parametrize(
    "h,w,cout",
    [
        (16, 128, 4),  # lane-padded carry (serving default)
        (16, 136, 3),  # non-lane-aligned W + unpadded 3-channel output
        (8, 160, 4),   # minimum rows (2 bands)
    ],
)
def test_tail_fuse_matches_reference(rng, h, w, cout):
    args = _mk(rng, h, w, cout=cout)
    want = tail_reference(*args)
    got = tail_fuse(*args, True)
    assert got.shape == (args[0].shape[0], 2 * h, 2 * w, cout)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_tail_fuse_grad_matches_reference(rng):
    args = _mk(rng, 8, 128)

    g_f = jax.grad(lambda *a: jnp.mean(tail_fuse(*a, True) ** 2), argnums=range(7))(
        *args
    )
    g_r = jax.grad(lambda *a: jnp.mean(tail_reference(*a) ** 2), argnums=range(7))(
        *args
    )
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def _build_unet(rng):
    from dgm_img_super_resolution_tpu.models.unet import Unet

    model = Unet(dim=64, out_dim=3, dim_mults=(1, 2), cond_dim=4, rrdb_num_block=2)
    x = jnp.asarray(rng.standard_normal((1, 64, 256, 3)), jnp.float32)
    time = jnp.asarray([3.0], jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 16, 64, 4)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, time, cond)
    return model, params, (x, time, cond)


def test_unet_tail_path_matches_normal(rng, monkeypatch):
    model, params, args = _build_unet(rng)
    want = model.apply(params, *args)
    monkeypatch.setattr(layers, "TAIL_INTERPRET", True)
    got = model.apply(params, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_unet_tail_path_lane_padded(rng, monkeypatch):
    """4-lane x in → 4-lane ε out with an exactly-zero pad lane (the
    sampler's lane-padded carry contract)."""
    model, params, args = _build_unet(rng)
    x, time, cond = args
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    want = model.apply(params, xp, time, cond)
    monkeypatch.setattr(layers, "TAIL_INTERPRET", True)
    got = model.apply(params, xp, time, cond)
    assert got.shape[-1] == 4
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)
    assert np.abs(np.asarray(got[..., 3])).max() == 0.0


def test_unet_tail_param_tree_unchanged(rng, monkeypatch):
    """The weights_only tail path must create exactly the params of the
    normal path (checkpoint schema invariance — flax raises on mismatch)."""
    model, params, args = _build_unet(rng)
    monkeypatch.setattr(layers, "TAIL_INTERPRET", True)
    model.apply(params, *args)


def test_unet_tail_grad(rng, monkeypatch):
    model, params, args = _build_unet(rng)
    monkeypatch.setattr(layers, "TAIL_INTERPRET", True)
    g_fused = jax.grad(lambda p: jnp.mean(model.apply(p, *args) ** 2))(params)
    monkeypatch.setattr(layers, "TAIL_INTERPRET", False)
    g_ref = jax.grad(lambda p: jnp.mean(model.apply(p, *args) ** 2))(params)
    d = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        g_fused, g_ref,
    )
    assert max(jax.tree.leaves(d)) < 1e-5
