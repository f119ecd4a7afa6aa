"""Unet fused-chain serving path (DGMSR_PALLAS_FUSED) == normal XLA path.

Exercises both fused regions — down stage 0 (with the RRDB-condition add
folded into the kernel epilogue) and the last up stage (virtual-concat skip
head) — in interpreter mode on CPU, against the standard module path on the
same params.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from dgm_img_super_resolution_tpu.models import layers
from dgm_img_super_resolution_tpu.models.unet import Unet


def _build(rng):
    model = Unet(dim=64, out_dim=3, dim_mults=(1, 2), cond_dim=4, rrdb_num_block=2)
    x = jnp.asarray(rng.standard_normal((1, 64, 256, 3)), jnp.float32)
    time = jnp.asarray([3.0], jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 16, 64, 4)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, time, cond)
    return model, params, (x, time, cond)


def test_fused_unet_matches_normal(rng, monkeypatch):
    model, params, args = _build(rng)
    want = model.apply(params, *args)

    monkeypatch.setattr(layers, "CHAIN_INTERPRET", True)
    got = model.apply(params, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_fused_unet_param_tree_unchanged(rng, monkeypatch):
    """parts-mode calls must create exactly the params of the normal path
    (checkpoint schema invariance)."""
    model, params, args = _build(rng)
    monkeypatch.setattr(layers, "CHAIN_INTERPRET", True)
    # apply with the fused path must succeed against normally-initialised
    # params with no missing/extra param errors (flax raises on mismatch)
    model.apply(params, *args)
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert len(flat) > 0


def test_fused_unet_grad(rng, monkeypatch):
    """Training through the fused path differentiates via the XLA reference."""
    model, params, args = _build(rng)
    monkeypatch.setattr(layers, "CHAIN_INTERPRET", True)

    def loss(p):
        return jnp.mean(model.apply(p, *args) ** 2)

    g_fused = jax.grad(loss)(params)

    monkeypatch.setattr(layers, "CHAIN_INTERPRET", False)
    g_ref = jax.grad(loss)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        ),
        g_fused,
        g_ref,
    )


def test_stem_kernel_sees_compute_dtype(rng, monkeypatch):
    """The stem-fused call must cast x to the module compute dtype: the
    kernel derives its VMEM rolling-slot dtype from x, and the sampler scan
    carries the noisy residual in f32 — an uncast x doubles the scratch
    footprint and blows the 16 MB scoped-vmem limit at 512² on real TPU
    (caught by bench.py, round 3)."""
    from dgm_img_super_resolution_tpu.ops.pallas import block_chain as bc

    model = Unet(
        dim=64, out_dim=3, dim_mults=(1, 2), cond_dim=4, rrdb_num_block=2,
        dtype=jnp.bfloat16,
    )
    x = jnp.asarray(rng.standard_normal((1, 64, 256, 3)), jnp.float32)
    time = jnp.asarray([3.0], jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 16, 64, 4)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, time, cond)

    seen = {}
    orig = bc.block_chain3_stem
    orig_ds = bc.block_chain3_stem_ds

    def spy(x, *a, **kw):
        seen["x_dtype"] = x.dtype
        return orig(x, *a, **kw)

    def spy_ds(x, *a, **kw):
        seen["x_dtype"] = x.dtype
        return orig_ds(x, *a, **kw)

    monkeypatch.setattr(layers, "CHAIN_INTERPRET", True)
    monkeypatch.setattr(bc, "block_chain3_stem", spy)
    # down stage 0 routes through the ds-folded variant by default
    monkeypatch.setattr(bc, "block_chain3_stem_ds", spy_ds)
    model.apply(params, x, time, cond)
    assert seen["x_dtype"] == jnp.bfloat16


def test_stem_gate_requires_c64(rng, monkeypatch):
    """A non-default width (dim=128) admitted via DGMSR_CHAIN_C must NOT
    route down stage 0 into the stem kernel (packed-only, Mosaic rejects
    C≥128) — it takes the non-stem head path, which has the unpacked mode,
    and still matches the XLA composition (ADVICE r3 low #1)."""
    from dgm_img_super_resolution_tpu.ops.pallas import block_chain as bc

    model = Unet(dim=128, out_dim=3, dim_mults=(1, 2), cond_dim=4, rrdb_num_block=2)
    x = jnp.asarray(rng.standard_normal((1, 32, 128, 3)), jnp.float32)
    time = jnp.asarray([3.0], jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 8, 32, 4)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, time, cond)
    want = model.apply(params, x, time, cond)

    calls = {"stem": 0, "head": 0}
    orig_stem, orig_head = bc.block_chain3_stem, bc.block_chain3

    def spy_stem(*a, **kw):
        calls["stem"] += 1
        return orig_stem(*a, **kw)

    def spy_head(*a, **kw):
        calls["head"] += 1
        return orig_head(*a, **kw)

    monkeypatch.setattr(layers, "CHAIN_INTERPRET", True)
    monkeypatch.setenv("DGMSR_CHAIN_C", "128")
    monkeypatch.setattr(bc, "block_chain3_stem", spy_stem)
    monkeypatch.setattr(bc, "block_chain3", spy_head)
    got = model.apply(params, x, time, cond)
    assert calls["stem"] == 0 and calls["head"] > 0, calls
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_chain_eligible_gate(monkeypatch):
    """Default-ON on TPU for validated shapes; DGMSR_PALLAS_FUSED=0 opts out.
    Non-lane-aligned widths ARE eligible (W ≥ 128, aligned or not — measured
    1.53× at W=500); the channel set comes from _chain_channels()/DGMSR_CHAIN_C
    (default {64}), so non-default widths like C=128 need the env override."""
    monkeypatch.setattr(layers.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("DGMSR_PALLAS_FUSED", raising=False)
    monkeypatch.delenv("DGMSR_CHAIN_C", raising=False)
    assert layers.chain_eligible(512, 512, 64)   # down stage 0
    assert layers.chain_eligible(256, 256, 64)   # last up stage
    assert layers.chain_eligible(504, 500, 64)   # native-size (non-aligned W:
    # measured 1.53x region win at W=500 — VERDICT r2 #7)
    assert not layers.chain_eligible(512, 100, 64)   # W below measured floor
    assert not layers.chain_eligible(30, 512, 64)    # h not block-aligned
    # channel widths outside the measured default set fall back, but the
    # DGMSR_CHAIN_C override admits them for A/B runs
    assert not layers.chain_eligible(256, 256, 128)
    monkeypatch.setenv("DGMSR_CHAIN_C", "64,128")
    assert layers.chain_eligible(256, 256, 128)
    monkeypatch.delenv("DGMSR_CHAIN_C", raising=False)
    monkeypatch.setenv("DGMSR_PALLAS_FUSED", "0")
    assert not layers.chain_eligible(512, 512, 64)
    monkeypatch.setenv("DGMSR_PALLAS_FUSED", "false")
    assert not layers.chain_eligible(512, 512, 64)
    # non-TPU backends never take the kernel path (CHAIN_INTERPRET aside)
    monkeypatch.delenv("DGMSR_PALLAS_FUSED", raising=False)
    monkeypatch.setattr(layers.jax, "default_backend", lambda: "cpu")
    assert not layers.chain_eligible(512, 512, 64)


def test_fused_unet_head_variant_matches_normal(rng, monkeypatch):
    """Opt-in head-fused chain (DGMSR_PALLAS_HEAD=1 — default OFF per the
    measured in-scan regression, docs/DESIGN.md "Head-fused chain study")
    routes the up-stage pair through block_chain3_head and must match."""
    model, params, args = _build(rng)
    want = model.apply(params, *args)
    monkeypatch.setenv("DGMSR_PALLAS_HEAD", "1")
    monkeypatch.setattr(layers, "CHAIN_INTERPRET", True)
    got = model.apply(params, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)
