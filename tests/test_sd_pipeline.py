"""SD x4-upscaler path tests on tiny configs: VAE roundtrip shapes, UNet
conditioning, CLIP encoder/tokenizer contracts, full pipeline, and Pallas
kernels (interpret mode on CPU) against XLA references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full SD pipeline forwards; excluded from the default run

from dgm_img_super_resolution_tpu.models.sd.attention import MultiHeadAttention, Transformer2D
from dgm_img_super_resolution_tpu.models.sd.clip import CLIPTextEncoder, SimpleTokenizer
from dgm_img_super_resolution_tpu.models.sd.pipeline import StableDiffusionUpscalePipeline
from dgm_img_super_resolution_tpu.models.sd.unet import UNet2DCondition
from dgm_img_super_resolution_tpu.models.sd.vae import AutoencoderKL
from dgm_img_super_resolution_tpu.ops.pallas.attention import flash_attention
from dgm_img_super_resolution_tpu.ops.pallas.groupnorm import fused_group_norm


def test_vae_encode_decode_shapes():
    vae = AutoencoderKL(block_out_channels=(16, 32), layers_per_block=1)
    x = jnp.zeros((1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    z = vae.apply({"params": params}, x, method=vae.encode)
    assert z.shape == (1, 16, 16, 4)  # f=2 per missing-last-downsample: 2 blocks → one halving
    img = vae.apply({"params": params}, z, method=vae.decode)
    assert img.shape == (1, 32, 32, 3)


def test_vae_f4_with_three_blocks():
    vae = AutoencoderKL(block_out_channels=(16, 32, 32), layers_per_block=1)
    x = jnp.zeros((1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    z = vae.apply({"params": params}, x, method=vae.encode)
    assert z.shape == (1, 8, 8, 4)  # two halvings = f=4 (x4-upscaler config)


def test_unet2dcondition_shapes():
    unet = UNet2DCondition(
        block_out_channels=(16, 32), attn_levels=(1,), head_dim=8,
        cross_attention_dim=24, layers_per_block=1,
    )
    x = jnp.zeros((2, 16, 16, 7))
    t = jnp.array([10, 500])
    ctx = jnp.zeros((2, 7, 24))
    nl = jnp.array([20, 20])
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx, nl)["params"]
    out = unet.apply({"params": params}, x, t, ctx, nl)
    assert out.shape == (2, 16, 16, 4)
    # noise-level conditioning changes the output
    out2 = unet.apply({"params": params}, x, t, ctx, jnp.array([300, 300]))
    assert np.abs(np.asarray(out - out2)).max() > 1e-6


def test_clip_text_encoder_and_tokenizer():
    tok = SimpleTokenizer(vocab_size=1024)
    ids = tok(["a photo of a cat", ""])
    assert ids.shape == (2, 77) and ids.dtype == np.int32
    assert ids[0, 0] == tok.bos
    assert tok.eos in ids[0]
    # deterministic
    np.testing.assert_array_equal(ids, tok(["a photo of a cat", ""]))
    enc = CLIPTextEncoder(vocab_size=1024, width=32, layers=2, heads=4)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    out = enc.apply({"params": params}, jnp.asarray(ids))
    assert out.shape == (2, 77, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_causal_mask_in_clip():
    """Changing a later token must not affect earlier positions' features."""
    enc = CLIPTextEncoder(vocab_size=256, width=16, layers=1, heads=2)
    a = jnp.asarray(np.array([[5, 7, 9, 11]], np.int32))
    b = jnp.asarray(np.array([[5, 7, 9, 200]], np.int32))
    params = enc.init(jax.random.PRNGKey(0), a)["params"]
    fa = enc.apply({"params": params}, a)
    fb = enc.apply({"params": params}, b)
    np.testing.assert_allclose(np.asarray(fa[0, :3]), np.asarray(fb[0, :3]), atol=1e-5)
    assert np.abs(np.asarray(fa[0, 3] - fb[0, 3])).max() > 1e-4


@pytest.fixture(scope="module")
def tiny_pipe():
    return StableDiffusionUpscalePipeline(tiny=True, dtype=jnp.float32)


def test_sd_pipeline_end_to_end(tiny_pipe):
    img = np.random.default_rng(0).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    steps_seen = []
    out = tiny_pipe(
        "a cat",
        img,
        num_inference_steps=3,
        guidance_scale=7.5,
        callback=lambda i, t, latents: steps_seen.append((i, t)),
    )
    assert out.shape == (1, 32, 32, 3)  # tiny VAE is f=2 → ×2... see note below
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0
    assert len(steps_seen) == 3


def test_sd_pipeline_encoder_propagation(tiny_pipe):
    """enc_interval=1 is the plain path bitwise; enc_interval=2 over 5 steps
    (remainder runs per-step) is deterministic and finite. Exactness of the
    UNet encode∘decode split is pinned separately below."""
    img = np.random.default_rng(2).integers(0, 256, (12, 12, 3), dtype=np.uint8)
    base = tiny_pipe("a cat", img, num_inference_steps=5, rng=jax.random.PRNGKey(5))
    same = tiny_pipe("a cat", img, num_inference_steps=5, rng=jax.random.PRNGKey(5),
                     enc_interval=1)
    np.testing.assert_allclose(same, base, atol=0)
    ep = tiny_pipe("a cat", img, num_inference_steps=5, rng=jax.random.PRNGKey(5),
                   enc_interval=2)
    ep2 = tiny_pipe("a cat", img, num_inference_steps=5, rng=jax.random.PRNGKey(5),
                    enc_interval=2)
    np.testing.assert_allclose(ep, ep2, atol=0)
    assert np.isfinite(ep).all()
    assert np.abs(ep - base).max() > 0  # approximation, not identity


def test_sd_unet_encode_decode_composition_is_exact(tiny_pipe):
    unet, params = tiny_pipe.unet, tiny_pipe.params["unet"]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, unet.in_channels)), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 5, unet.cross_attention_dim)), jnp.float32)
    nl = jnp.array([2, 2], jnp.int32)
    full = unet.apply({"params": params}, x, t, ctx, nl)
    enc = unet.apply({"params": params}, x, t, ctx, nl, mode="encode")
    split = unet.apply({"params": params}, None, t, ctx, nl, mode="decode", enc_feats=enc)
    np.testing.assert_allclose(np.asarray(split), np.asarray(full), atol=0)


def test_sd_pipeline_batched_and_deterministic(tiny_pipe):
    imgs = np.random.default_rng(1).integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    a = tiny_pipe(["a cat", "a car"], imgs, num_inference_steps=2, rng=jax.random.PRNGKey(3))
    b = tiny_pipe(["a cat", "a car"], imgs, num_inference_steps=2, rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(a, b, atol=0)
    c = tiny_pipe(["a cat", "a car"], imgs, num_inference_steps=2, rng=jax.random.PRNGKey(4))
    assert np.abs(a - c).max() > 1e-6


def test_sd_sampler_family_eta_ddpm(tiny_pipe):
    """The SD pipeline exposes the reference app's scheduler choice
    (st_app2.py:62-67): DDPM ≡ DDIM η=1 exactly (the respaced-ancestral
    identity, mirrored from the SRDiff side), η>0 is deterministic under a
    fixed rng, and segmentation (the progress path) is result-invariant even
    with the stochastic term."""
    img = np.random.default_rng(7).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(11)
    ddpm = tiny_pipe("a cat", img, num_inference_steps=4, rng=key, sampler="ddpm")
    eta1 = tiny_pipe("a cat", img, num_inference_steps=4, rng=key, eta=1.0)
    np.testing.assert_allclose(ddpm, eta1, atol=0)

    e7a = tiny_pipe("a cat", img, num_inference_steps=4, rng=key, eta=0.7)
    e7b = tiny_pipe("a cat", img, num_inference_steps=4, rng=key, eta=0.7)
    np.testing.assert_allclose(e7a, e7b, atol=0)
    e0 = tiny_pipe("a cat", img, num_inference_steps=4, rng=key)
    assert np.abs(e7a - e0).max() > 1e-6

    seen = []
    seg = tiny_pipe("a cat", img, num_inference_steps=4, rng=key, eta=1.0,
                    callback=lambda i, t, latents: seen.append(i), callback_steps=1)
    np.testing.assert_allclose(seg, eta1, atol=0)
    assert len(seen) == 4

    with pytest.raises(ValueError):
        tiny_pipe("a cat", img, num_inference_steps=2, sampler="plms")


def test_sd_timesteps_leading_spacing(tiny_pipe):
    """Timesteps follow diffusers' "leading" spacing with the published
    steps_offset=1 and the set_alpha_to_one=False terminal ᾱ."""
    T = tiny_pipe.schedule.num_timesteps
    assert tiny_pipe.steps_offset == 1
    ratio = T // 4
    expect = (np.arange(4) * ratio)[::-1] + 1
    # reproduce the schedule computation used by __call__
    ts = ((np.arange(4) * ratio)[::-1] + tiny_pipe.steps_offset).astype(np.int32)
    np.testing.assert_array_equal(ts, expect)
    assert tiny_pipe.final_alpha_cumprod == float(tiny_pipe.schedule.alphas_cumprod[0])
    assert tiny_pipe.prediction_type == "v_prediction"
    # low-res augmentation uses the image-space betas, not the latent betas
    assert float(tiny_pipe.low_res_schedule.betas[-1]) != float(tiny_pipe.schedule.betas[-1])


def _ref_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("l,bq,bk", [(256, 64, 64), (128, 128, 32)])
def test_flash_attention_matches_reference(l, bq, bk, rng):
    q = jnp.asarray(rng.standard_normal((2, l, 2, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, l, 2, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, l, 2, 64)).astype(np.float32))
    got = flash_attention(q, k, v, block_q=bq, block_k=bk, interpret=True)
    want = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_group_norm_matches_flax(rng):
    from flax import linen as nn

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    got = fused_group_norm(x, scale, bias, groups=8, eps=1e-6, interpret=True)
    gn = nn.GroupNorm(num_groups=8)  # flax default epsilon=1e-6
    want = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # silu fusion
    got_silu = fused_group_norm(x, scale, bias, groups=8, eps=1e-6, act="silu", interpret=True)
    np.testing.assert_allclose(np.asarray(got_silu), np.asarray(want * jax.nn.sigmoid(want)), atol=1e-5)


def test_multihead_attention_flash_and_xla_agree(rng):
    mha = MultiHeadAttention(heads=2, head_dim=64, out_dim=32)
    x = jnp.asarray(rng.standard_normal((1, 256, 32)).astype(np.float32))
    params = mha.init(jax.random.PRNGKey(0), x)["params"]
    base = mha.apply({"params": params}, x)
    mha_flash = MultiHeadAttention(heads=2, head_dim=64, out_dim=32, use_flash=True)
    fast = mha_flash.apply({"params": params}, x)
    # 256 tokens < 1024 threshold → same XLA path; force via threshold-sized input
    np.testing.assert_allclose(np.asarray(base), np.asarray(fast), atol=1e-5)
