"""Fused ResnetBlock-pair chain kernel (ops/pallas/block_chain.py) vs the XLA
reference composition, in interpreter mode (runs on CPU).

The chain is the 512² down-stage-0 / 256² up-stage-2 region of the SRDiff
UNet (reference ``srdiff/model.py:774-781,826-832``): three 64→64 reflect
convs with Mish / time-embedding / residual / condition epilogues fused in.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgm_img_super_resolution_tpu.ops.pallas.block_chain import (
    block_chain3,
    block_chain3_reference,
    block_chain3_stem,
    block_chain3_stem_reference,
)


def _inputs(rng, b=1, h=32, w=128, c=64, dtype=jnp.float32, cond=True):
    """Random chain inputs (c is generic: the kernel's rowpack matmuls are
    (W, 2c)@(2c, 2c) for any c — the C=128/192 UNet stages reuse it)."""
    def t(*shape, scale=1.0):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    args = dict(
        a_pre=t(b, h, w, c),
        r1=t(b, h, w, c),
        tv1=t(b, c),
        tv2=t(b, c),
        wb=t(3, 3, c, c, scale=0.08),
        bb=t(c),
        wc=t(3, 3, c, c, scale=0.08),
        bc=t(c),
        wd=t(3, 3, c, c, scale=0.08),
        bd=t(c),
        cond=t(b, h, w, c) if cond else None,
    )
    return args


@pytest.mark.parametrize("h,block_rows", [(32, 8), (16, 4), (24, 4), (32, 4)])
@pytest.mark.parametrize("cond", [True, False])
def test_chain_matches_reference_f32(rng, h, block_rows, cond):
    """nb = h/block_rows ∈ {4, 6, 8} exercises the mod-3 y1 slot rotation
    against both parities of the h1/h2 slots."""
    a = _inputs(rng, b=2, h=h, cond=cond)
    got = block_chain3(*a.values(), block_rows, True)
    want = block_chain3_reference(**a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("c", [128, 192])
def test_chain_wide_channels_f32(rng, c):
    """The C=128 (down stage 1 / up stage 1) and C=192 (down stage 2) UNet
    regions route through the same kernel — rowpack lanes become 2c.
    Tolerance is 5e-5: the larger K (2c accumulations per dot) shifts f32
    summation order vs the XLA conv (observed 2.9e-5 max at c=128)."""
    a = _inputs(rng, b=1, h=16, w=16, c=c, cond=False)
    got = block_chain3(*a.values(), 4, True)
    want = block_chain3_reference(**a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-5, atol=5e-5)


def test_chain_bf16(rng):
    """bf16 rounds at slightly different points (the kernel keeps residual
    adds in f32 before the storage cast) — bound the error distribution
    rather than elementwise-match."""
    a = _inputs(rng, dtype=jnp.bfloat16)
    got = np.asarray(block_chain3(*a.values(), 8, True), np.float32)
    want = np.asarray(block_chain3_reference(**a), np.float32)
    err = np.abs(got - want)
    assert np.mean(err) < 0.02, np.mean(err)
    assert np.max(err) < 0.5, np.max(err)


def _stem_inputs(rng, b=2, h=16, w=16, c=8, dtype=jnp.float32, cond=True):
    def t(*shape, scale=1.0):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    return dict(
        x=t(b, h, w, 3),
        wa=t(3, 3, 3, c, scale=0.2),
        ba=t(c, scale=0.1),
        wr=t(3, c, scale=0.2),
        br=t(c, scale=0.1),
        tv1=t(b, c, scale=0.1),
        tv2=t(b, c, scale=0.1),
        wb=t(3, 3, c, c, scale=0.08),
        bb=t(c, scale=0.1),
        wc=t(3, 3, c, c, scale=0.08),
        bc=t(c, scale=0.1),
        wd=t(3, 3, c, c, scale=0.08),
        bd=t(c, scale=0.1),
        cond=t(b, h, w, c, scale=0.1) if cond else None,
    )


@pytest.mark.parametrize("h,w,block_rows", [(16, 16, 4), (24, 12, 4), (16, 16, 8)])
@pytest.mark.parametrize("cond", [True, False])
def test_stem_chain_matches_reference_f32(rng, h, w, block_rows, cond):
    """Stem-fused variant: the 3→C reflect stem conv + 1×1 residual conv run
    inside the chain (4-lag pipeline, zero-padded 3→4 input channels).
    w=12 exercises a non-lane-aligned width. NOTE: must compare on the CPU
    backend (conftest forces it) — on TPU the XLA reference itself rounds
    matmul inputs to bf16 under default precision, producing ~1e-2 deltas
    that are precision noise, not kernel error."""
    a = _stem_inputs(rng, h=h, w=w, cond=cond)
    got = block_chain3_stem(*a.values(), block_rows, True)
    want = block_chain3_stem_reference(**a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_stem_chain_grad_flows_via_reference(rng):
    """Custom VJP routes backward through the XLA reference composition."""
    a = _stem_inputs(rng)

    def loss(fn):
        def f(x, wa):
            args = dict(a, x=x, wa=wa)
            extra = (4, True) if fn is block_chain3_stem else ()
            return jnp.sum(fn(*args.values(), *extra) ** 2)

        return f

    g_k = jax.grad(loss(block_chain3_stem), argnums=(0, 1))(a["x"], a["wa"])
    g_r = jax.grad(loss(block_chain3_stem_reference), argnums=(0, 1))(a["x"], a["wa"])
    for gk, gr in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=2e-3, atol=1e-2)


def test_chain_grad_flows_via_reference(rng):
    """The custom VJP routes backward through the XLA reference — grads must
    match differentiating the reference directly."""
    a = _inputs(rng, h=16)

    def loss_kernel(a_pre, wb):
        return jnp.sum(
            block_chain3(
                a_pre, a["r1"], a["tv1"], a["tv2"], wb, a["bb"], a["wc"], a["bc"],
                a["wd"], a["bd"], a["cond"], 4, True,
            )
            ** 2
        )

    def loss_ref(a_pre, wb):
        return jnp.sum(
            block_chain3_reference(
                a_pre, a["r1"], a["tv1"], a["tv2"], wb, a["bb"], a["wc"], a["bc"],
                a["wd"], a["bd"], a["cond"],
            )
            ** 2
        )

    g_k = jax.grad(loss_kernel, argnums=(0, 1))(a["a_pre"], a["wb"])
    g_r = jax.grad(loss_ref, argnums=(0, 1))(a["a_pre"], a["wb"])
    # the cotangent (2·out) carries the kernel-vs-reference forward noise, so
    # the comparison is relative-only with a small float slack
    for gk, gr in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=2e-3, atol=1e-2)


# ---- head-fused variant (block_chain3_head) --------------------------------

from dgm_img_super_resolution_tpu.ops.pallas.block_chain import (  # noqa: E402
    block_chain3_head,
    block_chain3_head_reference,
)


def _head_inputs(rng, b=1, h=16, w=128, cs=64, c=64, dtype=jnp.float32):
    r = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)  # noqa: E731
    return dict(
        x=r(b, h, w, cs), skip=r(b, h, w, cs),
        wa=r(3, 3, 2 * cs, c) * 0.05, ba=r(c) * 0.1,
        wr=r(2 * cs, c) * 0.05, br=r(c) * 0.1,
        tv1=r(b, c) * 0.1, tv2=r(b, c) * 0.1,
        wb=r(3, 3, c, c) * 0.05, bb=r(c) * 0.1,
        wc=r(3, 3, c, c) * 0.05, bc=r(c) * 0.1,
        wd=r(3, 3, c, c) * 0.05, bd=r(c) * 0.1,
    )


@pytest.mark.parametrize("cs,h,w", [(64, 16, 128), (128, 8, 136)])
def test_head_chain_matches_reference_f32(rng, cs, h, w):
    a = _head_inputs(rng, cs=cs, h=h, w=w)
    want = block_chain3_head_reference(
        a["x"], a["skip"], a["wa"], a["ba"], a["wr"], a["br"], a["tv1"], a["tv2"],
        a["wb"], a["bb"], a["wc"], a["bc"], a["wd"], a["bd"],
    )
    got = block_chain3_head(
        a["x"], a["skip"], a["wa"], a["ba"], a["wr"], a["br"], a["tv1"], a["tv2"],
        a["wb"], a["bb"], a["wc"], a["bc"], a["wd"], a["bd"], 4, True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_head_chain_grad_flows_via_reference(rng):
    a = _head_inputs(rng, h=8)

    def loss_kernel(x, wa):
        return jnp.sum(
            block_chain3_head(
                x, a["skip"], wa, a["ba"], a["wr"], a["br"], a["tv1"], a["tv2"],
                a["wb"], a["bb"], a["wc"], a["bc"], a["wd"], a["bd"], 4, True,
            )
            ** 2
        )

    def loss_ref(x, wa):
        return jnp.sum(
            block_chain3_head_reference(
                x, a["skip"], wa, a["ba"], a["wr"], a["br"], a["tv1"], a["tv2"],
                a["wb"], a["bb"], a["wc"], a["bc"], a["wd"], a["bd"],
            )
            ** 2
        )

    g_k = jax.grad(loss_kernel, argnums=(0, 1))(a["x"], a["wa"])
    g_r = jax.grad(loss_ref, argnums=(0, 1))(a["x"], a["wa"])
    for gk, gr in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=2e-3, atol=1e-2)


# ---- downsample-folded stem variant (block_chain3_stem_ds) -----------------

from dgm_img_super_resolution_tpu.ops.pallas.block_chain import (  # noqa: E402
    block_chain3_stem_ds,
    block_chain3_stem_ds_reference,
)


@pytest.mark.parametrize("cond", [True, False])
def test_stem_ds_matches_reference_f32(rng, cond):
    a = _stem_inputs(rng, b=1, h=16, w=128, c=64)
    r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731
    wds, bds = r(3, 3, 64, 64) * 0.05, r(64) * 0.1
    cd = a["cond"] if cond else None
    args = (a["x"], a["wa"], a["ba"], a["wr"], a["br"], a["tv1"], a["tv2"],
            a["wb"], a["bb"], a["wc"], a["bc"], a["wd"], a["bd"], cd, wds, bds)
    w_out, w_ds = block_chain3_stem_ds_reference(*args)
    g_out, g_ds = block_chain3_stem_ds(*args, 4, True)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(w_out), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ds), np.asarray(w_ds), rtol=1e-4, atol=1e-5)


def test_stem_ds_grad_flows_via_reference(rng):
    a = _stem_inputs(rng, b=1, h=8, w=128, c=64)
    r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731
    wds, bds = r(3, 3, 64, 64) * 0.05, r(64) * 0.1

    def loss(fn, x, wds_):
        o, d = fn(x, a["wa"], a["ba"], a["wr"], a["br"], a["tv1"], a["tv2"],
                  a["wb"], a["bb"], a["wc"], a["bc"], a["wd"], a["bd"], None,
                  wds_, bds, *extra)
        return jnp.sum(o ** 2) + jnp.sum(d ** 2)

    extra = (4, True)
    g_k = jax.grad(lambda x, w: loss(block_chain3_stem_ds, x, w), argnums=(0, 1))(
        a["x"], wds
    )
    extra = ()
    g_r = jax.grad(
        lambda x, w: loss(
            lambda *args: block_chain3_stem_ds_reference(*args), x, w
        ),
        argnums=(0, 1),
    )(a["x"], wds)
    for gk, gr in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=2e-3, atol=1e-2)
