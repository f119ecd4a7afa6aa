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
)


def _inputs(rng, b=1, h=32, w=128, c=64, dtype=jnp.float32, cond=True):
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
