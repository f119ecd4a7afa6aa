"""Shape/parity tests for the SRDiff model stack.

Primitive-level parity is checked against torch (available, CPU) — reflection
padding, transposed conv output-size conventions, Mish, LeakyReLU — so the
checkpoint importer can rely on exact layer semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

slow = pytest.mark.slow  # >10 s on the 1-core host; excluded from the default run

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.models.factory import (
    build_rrdb,
    build_srdiff,
    build_unet,
    init_srdiff_params,
)
from dgm_img_super_resolution_tpu.models.layers import (
    ConvTranspose2dTorch,
    mish,
    reflect_pad,
    sinusoidal_pos_emb,
)

HP = Hparams(compute_dtype="float32")


def test_mish_matches_torch(rng):
    x = rng.standard_normal((4, 7)).astype(np.float32)
    want = F.mish(torch.from_numpy(x)).numpy()
    got = np.asarray(mish(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_reflect_pad_matches_torch(rng):
    x = rng.standard_normal((2, 5, 6, 3)).astype(np.float32)
    want = torch.nn.ReflectionPad2d(1)(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = np.asarray(reflect_pad(jnp.asarray(x), 1))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), atol=0)


@pytest.mark.parametrize("variant", ["dilated", "phase4", "embed3x3"])
def test_upsample_formulations_identical(variant, rng, monkeypatch):
    """The three k4/s2/p1 ConvTranspose formulations (DGMSR_UPSAMPLE) are the
    same operator: each matches the torch ConvTranspose2d oracle, including
    at odd spatial sizes where the parity slices are exercised asymmetrically."""
    monkeypatch.setenv("DGMSR_UPSAMPLE", variant)
    cin, cout, h, w = 5, 7, 9, 6
    x = rng.standard_normal((2, h, w, cin)).astype(np.float32)
    w_t = rng.standard_normal((cin, cout, 4, 4)).astype(np.float32) * 0.1
    b_t = rng.standard_normal((cout,)).astype(np.float32)
    want = F.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w_t), torch.from_numpy(b_t), stride=2, padding=1,
    ).permute(0, 2, 3, 1).numpy()
    mod = ConvTranspose2dTorch(cout, 4, 2, 1)
    kernel = jnp.asarray(np.transpose(w_t[:, :, ::-1, ::-1], (2, 3, 0, 1)))
    params = {"params": {"kernel": kernel, "bias": jnp.asarray(b_t)}}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("k,s,p,h", [(4, 2, 1, 8), (8, 4, 2, 16), (3, 1, 1, 9)])
def test_conv_transpose_matches_torch(k, s, p, h, rng):
    """ConvTranspose2dTorch == torch ConvTranspose2d under the weight map
    K_hwio[h,w,i,o] = W_torch[i,o,K-1-h,K-1-w]."""
    cin, cout = 5, 7
    x = rng.standard_normal((2, h, h, cin)).astype(np.float32)
    w_t = rng.standard_normal((cin, cout, k, k)).astype(np.float32) * 0.1
    b_t = rng.standard_normal((cout,)).astype(np.float32)
    want = F.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w_t),
        torch.from_numpy(b_t),
        stride=s,
        padding=p,
    ).permute(0, 2, 3, 1).numpy()

    mod = ConvTranspose2dTorch(cout, k, s, p)
    kernel = jnp.asarray(np.transpose(w_t[:, :, ::-1, ::-1], (2, 3, 0, 1)))
    params = {"params": {"kernel": kernel, "bias": jnp.asarray(b_t)}}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape == (2, (h - 1) * s - 2 * p + k, (h - 1) * s - 2 * p + k, cout)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_reflect_conv3x3_matches_torch_reflectpad_conv(rng):
    """The zero-pad + border-correction formulation must be exactly the
    reflect-pad conv (fp32)."""
    from dgm_img_super_resolution_tpu.models.layers import reflect_conv3x3

    cin, cout = 5, 7
    x = rng.standard_normal((2, 12, 10, cin)).astype(np.float32)
    w_t = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.2
    b_t = rng.standard_normal((cout,)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.conv2d(torch.nn.ReflectionPad2d(1)(xt), torch.from_numpy(w_t), torch.from_numpy(b_t))
    want = want.permute(0, 2, 3, 1).numpy()
    kernel = jnp.asarray(np.transpose(w_t, (2, 3, 1, 0)))
    got = np.asarray(reflect_conv3x3(jnp.asarray(x), kernel, jnp.asarray(b_t)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sinusoidal_pos_emb_reference_spacing():
    t = jnp.array([0.0, 1.0, 50.0])
    emb = sinusoidal_pos_emb(t, 64)
    assert emb.shape == (3, 64)
    # t=0: sin part 0, cos part 1
    np.testing.assert_allclose(np.asarray(emb[0, :32]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(emb[0, 32:]), 1.0, atol=1e-7)
    # frequency spacing: emb_k = exp(-k*log(10000)/(half-1))
    freqs = np.exp(np.arange(32) * -(np.log(10000.0) / 31))
    np.testing.assert_allclose(np.asarray(emb[1, :32]), np.sin(freqs), atol=1e-6)


@slow
def test_rrdb_shapes_and_cond_features():
    rrdb = build_rrdb(HP)
    x = jnp.zeros((1, 16, 16, 3))
    variables = rrdb.init(jax.random.PRNGKey(0), x, True)
    out, feas = rrdb.apply(variables, x, True)
    assert out.shape == (1, 64, 64, 3)  # ×4 upsample
    assert len(feas) == 9  # 8 RRDB features + fused trunk
    assert all(f.shape == (1, 16, 16, 32) for f in feas)
    # output range is [-1, 1] by construction
    assert float(out.max()) <= 1.0 and float(out.min()) >= -1.0


@slow
def test_unet_shapes():
    unet = build_unet(HP)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.array([5, 50])
    cond = jnp.zeros((2, 8, 8, 96))  # 3×32-channel selected RRDB features
    variables = unet.init(jax.random.PRNGKey(0), x, t, cond, x)
    y = unet.apply(variables, x, t, cond, x)
    assert y.shape == (2, 32, 32, 3)


@slow
def test_unet_param_structure_matches_reference_topology():
    unet = build_unet(HP)
    x = jnp.zeros((1, 32, 32, 3))
    variables = unet.init(jax.random.PRNGKey(0), x, jnp.array([0]), jnp.zeros((1, 8, 8, 96)), x)
    p = variables["params"]
    # 4 down stages, 3 up stages, 2 mid blocks, cond_proj, final
    for i in range(4):
        assert f"down_{i}_res1" in p and f"down_{i}_res2" in p
    for i in range(3):
        assert f"down_{i}_downsample" in p
    assert "down_3_downsample" not in p
    for i in range(3):
        assert f"up_{i}_res1" in p and f"up_{i}_upsample" in p
    assert "mid_block1" in p and "mid_block2" in p and "cond_proj" in p
    # cond_proj: k=8, s=4, p=2 transposed conv from 96 → 64 channels
    assert p["cond_proj"]["kernel"].shape == (8, 8, 96, 64)
    # groups=0 ⇒ no norm layers anywhere
    flat = jax.tree_util.tree_leaves_with_path(p)
    assert not any("norm" in jax.tree_util.keystr(path) for path, _ in flat)


@slow
def test_srdiff_param_count_reasonable():
    diffusion = build_srdiff(HP)
    params = init_srdiff_params(diffusion, jax.random.PRNGKey(0), HP, hr_size=32)
    n_unet = sum(x.size for x in jax.tree_util.tree_leaves(params["denoise_fn"]))
    n_rrdb = sum(x.size for x in jax.tree_util.tree_leaves(params["rrdb"]))
    # Upstream SRDiff: UNet ≈ 11.8M params, RRDB(nf=32, nb=8, gc=16) ≈ 1.5M.
    assert 10e6 < n_unet < 14e6, n_unet
    assert 1e6 < n_rrdb < 2e6, n_rrdb


def test_reflect_conv_stride2_matches_materialised_pad(rng):
    from dgm_img_super_resolution_tpu.models.layers import (
        reflect_conv3x3_stride2,
        reflect_pad,
    )

    x = jnp.asarray(rng.standard_normal((2, 12, 16, 5)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((7,)).astype(np.float32))
    got = reflect_conv3x3_stride2(x, k, b)
    ref = jax.lax.conv_general_dilated(
        reflect_pad(x, 1), k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@slow
def test_resnet_block_skip_pair_equals_concat(rng):
    """The virtual-concat skip join is numerically the explicit concat."""
    from dgm_img_super_resolution_tpu.models.layers import ResnetBlock

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((2, 8, 8, 10)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    blk = ResnetBlock(dim_out=5, time_emb_dim=4)
    params = blk.init(jax.random.PRNGKey(0), x, t, skip=skip)
    out_pair = blk.apply(params, x, t, skip=skip)
    out_cat = blk.apply(params, jnp.concatenate([x, skip], -1), t)
    np.testing.assert_allclose(np.asarray(out_pair), np.asarray(out_cat), atol=1e-5)


def test_downsample_even_and_odd_paths(rng):
    from dgm_img_super_resolution_tpu.models.layers import Downsample, reflect_pad

    ds = Downsample()
    for h, w in ((8, 8), (7, 9)):
        x = jnp.asarray(rng.standard_normal((1, h, w, 4)).astype(np.float32))
        params = ds.init(jax.random.PRNGKey(0), x)
        got = ds.apply(params, x)
        k = params["params"]["conv"]["kernel"]
        b = params["params"]["conv"]["bias"]
        ref = jax.lax.conv_general_dilated(
            reflect_pad(x, 1), k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
        assert got.shape[1:3] == ((h + 1) // 2, (w + 1) // 2)


def test_conv_transpose_output_padding_matches_torch(rng):
    """torch ConvTranspose2d(k3,s2,p1,output_padding=1) — the AE decoder's
    exact upsampling block (simple_autoencoder.ipynb cell 4)."""
    cin, cout = 4, 6
    x = rng.standard_normal((2, 4, 4, cin)).astype(np.float32)
    w_t = rng.standard_normal((cin, cout, 3, 3)).astype(np.float32) * 0.1
    b_t = rng.standard_normal((cout,)).astype(np.float32)
    want = F.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w_t),
        torch.from_numpy(b_t), stride=2, padding=1, output_padding=1,
    ).permute(0, 2, 3, 1).numpy()
    mod = ConvTranspose2dTorch(cout, 3, 2, 1, output_padding=1)
    kernel = jnp.asarray(np.transpose(w_t[:, :, ::-1, ::-1], (2, 3, 0, 1)))
    got = np.asarray(mod.apply({"params": {"kernel": kernel, "bias": jnp.asarray(b_t)}}, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 8, 8, cout)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# Pallas row-pair-packed reflect conv (ops/pallas/conv3x3.py) — the 512²/C=64
# fast path. Interpret mode exercises the kernel on CPU.


def test_rowpack_kernel_matches_reflect_conv(rng):
    from dgm_img_super_resolution_tpu.models.layers import mish, reflect_conv3x3
    from dgm_img_super_resolution_tpu.ops.pallas.conv3x3 import conv3x3_rowpack

    b, h, w, c = 2, 32, 24, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    ref = reflect_conv3x3(x, k, bias)
    got = conv3x3_rowpack(x, k, bias, border="reflect", block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    got_m = conv3x3_rowpack(
        x, k, bias, border="reflect", mish=True, block_rows=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(mish(ref)), atol=1e-5)


def test_block_rowpack_path_matches_xla_and_differentiates(rng, monkeypatch):
    """The fused Pallas path in Block must be numerically identical to the
    XLA fallback (fwd) and differentiate through the custom VJP (bwd)."""
    from dgm_img_super_resolution_tpu.models import layers

    b, h, w, c = 1, 32, 16, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    blk = layers.Block(dim_out=c)
    params = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(params, x)  # XLA path (backend is cpu)

    monkeypatch.setattr(layers, "ROWPACK_INTERPRET", True)
    got = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def loss(p, x_):
        return jnp.sum(blk.apply(p, x_) ** 2)

    g_fast = jax.grad(loss)(params, x)
    monkeypatch.setattr(layers, "ROWPACK_INTERPRET", False)
    g_ref = jax.grad(loss)(params, x)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-4
        ),
        g_fast, g_ref,
    )
