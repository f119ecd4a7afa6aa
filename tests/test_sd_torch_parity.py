"""Activation-level parity of the SD x4-upscaler stack against independent
torch twins (tests/torch_twins_sd.py) — the SD-side counterpart of
``tests/test_torch_parity.py`` (VERDICT r2 missing #1).

One random diffusers-schema state dict (enumerated by the NON-circular
inventory, ``ckpt/sd_inventory.py``) is loaded into BOTH stacks:

- torch twin via ``load_state_dict(strict=True)`` — key-schema agreement
  between the inventory and a real nn.Module realisation of the published
  layout;
- Flax via the importer rule table (``ckpt/sd_import.convert_component``) —
  so a wrong rule, layout transform, or Flax forward semantics breaks
  fp32 activation parity below.

These twins caught real semantic bugs on first run: the SD UNet was using the
SRDiff timestep-embedding convention instead of diffusers'
``flip_sin_to_cos``/shift-0 one, GEGLU used jax's tanh-approx GELU instead of
torch's exact erf form, and the CLIP tower used quick-GELU where the SD2
family uses exact GELU.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # builds torch+jax model pairs per test
import torch

import jax
import jax.numpy as jnp

from dgm_img_super_resolution_tpu.ckpt.sd_import import convert_component
from dgm_img_super_resolution_tpu.ckpt.sd_inventory import (
    text_encoder_state_dict_shapes,
    unet_state_dict_shapes,
    vae_state_dict_shapes,
)
from dgm_img_super_resolution_tpu.models.sd.clip import CLIPTextEncoder, SimpleTokenizer
from dgm_img_super_resolution_tpu.models.sd.unet import UNet2DCondition
from dgm_img_super_resolution_tpu.models.sd.vae import AutoencoderKL

from torch_twins_sd import (
    AutoencoderKLTwin,
    CLIPTextTwin,
    UNet2DConditionTwin,
)

torch.manual_seed(0)

UNET_TINY = {
    "in_channels": 7,
    "out_channels": 4,
    "block_out_channels": [32, 64],
    "layers_per_block": 2,
    "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D"],
    "up_block_types": ["CrossAttnUpBlock2D", "UpBlock2D"],
    "attention_head_dim": 2,  # SD-era semantics: the head COUNT
    "cross_attention_dim": 64,
    "only_cross_attention": [False, True],
    "num_class_embeds": 17,
}

VAE_TINY = {
    "in_channels": 3,
    "out_channels": 3,
    "block_out_channels": [32, 64],
    "layers_per_block": 2,
    "latent_channels": 4,
    "legacy_attention_keys": True,
    "scaling_factor": 0.08333,
}

CLIP_TINY = {
    "vocab_size": 1024,
    "hidden_size": 64,
    "intermediate_size": 256,
    "num_hidden_layers": 3,
    "num_attention_heads": 4,
    "max_position_embeddings": 77,
    "hidden_act": "gelu",
    "layer_norm_eps": 1e-5,
}


def random_state_dict(shapes: dict[str, tuple], seed: int) -> dict[str, np.ndarray]:
    """Random weights at sane magnitudes for every inventory key: norm scales
    near 1, biases/embeddings small, conv/linear kernels fan-in scaled."""
    g = np.random.default_rng(seed)
    sd = {}
    for key, shp in shapes.items():
        leaf = key.rsplit(".", 1)[-1]
        if leaf == "bias":
            v = 0.02 * g.standard_normal(shp)
        elif len(shp) == 1:  # norm scale
            v = 1.0 + 0.05 * g.standard_normal(shp)
        elif "embedding" in key:
            v = 0.05 * g.standard_normal(shp)
        else:  # conv (o,i,kh,kw) / linear (o,i)
            fan_in = int(np.prod(shp[1:]))
            v = g.standard_normal(shp) / np.sqrt(fan_in)
        sd[key] = v.astype(np.float32)
    return sd


def _torch(sd):
    return {k: torch.tensor(v) for k, v in sd.items()}


def test_unet_twin_activation_parity():
    shapes = unet_state_dict_shapes(UNET_TINY)
    sd = random_state_dict(shapes, seed=1)

    twin = UNet2DConditionTwin(UNET_TINY)
    # strict load: inventory keys == a real nn.Module realisation's keys
    twin.load_state_dict(_torch(sd), strict=True)
    twin.eval()

    tree, unused = convert_component(sd, "unet")
    assert not unused
    model = UNet2DCondition.from_config(UNET_TINY, dtype=jnp.float32)

    g = np.random.default_rng(2)
    x = g.standard_normal((2, 8, 8, 7)).astype(np.float32)
    t = np.array([5, 250], np.int32)
    ctx = g.standard_normal((2, 7, 64)).astype(np.float32)
    nl = np.array([3, 9], np.int32)

    out_j = model.apply(
        {"params": tree}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(nl),
    )
    with torch.no_grad():
        out_t = twin(
            torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t),
            torch.tensor(ctx), torch.tensor(nl.astype(np.int64)),
        )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(), atol=5e-5, rtol=1e-3
    )

    # noise-level (class) conditioning must flow through the shared embedding
    out_j2 = model.apply(
        {"params": tree}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(np.array([11, 1], np.int32)),
    )
    with torch.no_grad():
        out_t2 = twin(
            torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t),
            torch.tensor(ctx), torch.tensor(np.array([11, 1], np.int64)),
        )
    np.testing.assert_allclose(
        np.asarray(out_j2), out_t2.permute(0, 2, 3, 1).numpy(), atol=5e-5, rtol=1e-3
    )
    assert np.abs(np.asarray(out_j2 - out_j)).max() > 1e-6


def test_unet_twin_parity_all_self_attention():
    """Same check with only_cross_attention off everywhere (the published
    level-3 / mid-block configuration)."""
    cfg = dict(UNET_TINY, only_cross_attention=[False, False], layers_per_block=1)
    sd = random_state_dict(unet_state_dict_shapes(cfg), seed=3)
    twin = UNet2DConditionTwin(cfg)
    twin.load_state_dict(_torch(sd), strict=True)
    twin.eval()
    tree, _ = convert_component(sd, "unet")
    model = UNet2DCondition.from_config(cfg, dtype=jnp.float32)

    g = np.random.default_rng(4)
    x = g.standard_normal((1, 8, 8, 7)).astype(np.float32)
    t = np.array([42], np.int32)
    ctx = g.standard_normal((1, 5, 64)).astype(np.float32)
    nl = np.array([2], np.int32)
    out_j = model.apply({"params": tree}, jnp.asarray(x), jnp.asarray(t),
                        jnp.asarray(ctx), jnp.asarray(nl))
    with torch.no_grad():
        out_t = twin(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t),
                     torch.tensor(ctx), torch.tensor(nl.astype(np.int64)))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(), atol=5e-5, rtol=1e-3
    )


def test_vae_twin_activation_parity():
    sd = random_state_dict(vae_state_dict_shapes(VAE_TINY), seed=5)
    twin = AutoencoderKLTwin(VAE_TINY)
    twin.load_state_dict(_torch(sd), strict=True)
    twin.eval()

    tree, unused = convert_component(sd, "vae")
    assert not unused
    vae = AutoencoderKL(
        block_out_channels=tuple(VAE_TINY["block_out_channels"]),
        layers_per_block=VAE_TINY["layers_per_block"],
        latent_channels=VAE_TINY["latent_channels"],
        scaling_factor=VAE_TINY["scaling_factor"],
        dtype=jnp.float32,
    )

    g = np.random.default_rng(6)
    img = g.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    z_j = vae.apply({"params": tree}, jnp.asarray(img), method=vae.encode)
    with torch.no_grad():
        z_t = twin.encode_mean(torch.tensor(img).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(z_j), z_t.permute(0, 2, 3, 1).numpy(), atol=5e-5, rtol=1e-3
    )

    z = g.standard_normal((2, 8, 8, 4)).astype(np.float32) * 0.1
    out_j = vae.apply({"params": tree}, jnp.asarray(z), method=vae.decode)
    with torch.no_grad():
        out_t = twin.decode(torch.tensor(z).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(), atol=5e-5, rtol=1e-3
    )


def test_clip_twin_activation_parity():
    sd = random_state_dict(text_encoder_state_dict_shapes(CLIP_TINY), seed=7)
    twin = CLIPTextTwin(CLIP_TINY)
    twin.load_state_dict(_torch(sd), strict=True)
    twin.eval()

    tree, unused = convert_component(sd, "text_encoder")
    assert not unused
    enc = CLIPTextEncoder(
        vocab_size=CLIP_TINY["vocab_size"],
        width=CLIP_TINY["hidden_size"],
        layers=CLIP_TINY["num_hidden_layers"],
        heads=CLIP_TINY["num_attention_heads"],
        hidden_act=CLIP_TINY["hidden_act"],
        dtype=jnp.float32,
    )
    tok = SimpleTokenizer(vocab_size=CLIP_TINY["vocab_size"])
    ids = tok(["a photo of a cat", "low resolution"])
    out_j = enc.apply({"params": tree}, jnp.asarray(ids))
    with torch.no_grad():
        out_t = twin(torch.tensor(ids.astype(np.int64)))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), atol=5e-5, rtol=1e-3
    )


def test_clip_real_transformers_oracle():
    """Real-library oracle for the CLIP text tower (VERDICT r3 next #4): the
    installed ``transformers.CLIPTextModel`` — the exact class the reference's
    diffusers pipeline instantiates for the x4-upscaler's text encoder
    (``/root/reference/st_app2.py:15-27``) — is built at the tiny AND the
    full x4-upscaler config, ``load_state_dict(strict=True)``'d with the
    inventory-enumerated state dict (schema agreement with the real library,
    not just our hand-written twin), and must match the Flax tower's fp32
    activations. Replaces the shared-misconception risk of twin-vs-twin for
    this component (diffusers is absent, so UNet/VAE keep the twins)."""
    from transformers import CLIPTextConfig, CLIPTextModel

    from dgm_img_super_resolution_tpu.ckpt.sd_inventory import X4_TEXT_CONFIG

    for cfg_dict, seed, atol in ((CLIP_TINY, 17, 5e-5), (X4_TEXT_CONFIG, 18, 5e-4)):
        sd = random_state_dict(text_encoder_state_dict_shapes(cfg_dict), seed=seed)
        real = CLIPTextModel(CLIPTextConfig(**cfg_dict, attn_implementation="eager"))
        real.load_state_dict(_torch(sd), strict=True)  # raises on any schema drift
        real.eval()

        tree, unused = convert_component(sd, "text_encoder")
        assert not unused
        enc = CLIPTextEncoder(
            vocab_size=cfg_dict["vocab_size"],
            width=cfg_dict["hidden_size"],
            layers=cfg_dict["num_hidden_layers"],
            heads=cfg_dict["num_attention_heads"],
            hidden_act=cfg_dict["hidden_act"],
            dtype=jnp.float32,
        )
        tok = SimpleTokenizer(vocab_size=cfg_dict["vocab_size"])
        ids = tok(["a photo of a cat", ""])
        out_j = np.asarray(enc.apply({"params": tree}, jnp.asarray(ids)))
        with torch.no_grad():
            out_t = real(torch.tensor(ids.astype(np.int64))).last_hidden_state.numpy()
        np.testing.assert_allclose(out_j, out_t, atol=atol, rtol=1e-3)


def _np_schedule(beta_start, beta_end, T=1000):
    """Independent scaled-linear ᾱ (the published scheduler formula)."""
    betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def test_pipeline_end_to_end_parity():
    """Tiny full-pipeline parity: one random weight set, shared noise, 3
    v-prediction DDIM steps with CFG, VAE decode — flax vs a torch
    reimplementation of the published pipeline loop. >50 dB gate (same
    end-to-end mechanism the SRDiff side proves at 81 dB full-size)."""
    from dgm_img_super_resolution_tpu.models.sd.pipeline import (
        StableDiffusionUpscalePipeline,
    )

    unet_sd = random_state_dict(unet_state_dict_shapes(UNET_TINY), seed=11)
    vae_sd = random_state_dict(vae_state_dict_shapes(VAE_TINY), seed=12)
    clip_sd = random_state_dict(text_encoder_state_dict_shapes(CLIP_TINY), seed=13)

    params = {
        "unet": convert_component(unet_sd, "unet")[0],
        "vae": convert_component(vae_sd, "vae")[0],
        "text_encoder": convert_component(clip_sd, "text_encoder")[0],
    }
    tok = SimpleTokenizer(vocab_size=CLIP_TINY["vocab_size"])
    pipe = StableDiffusionUpscalePipeline(
        unet=UNet2DCondition.from_config(UNET_TINY, dtype=jnp.float32),
        vae=AutoencoderKL(
            block_out_channels=tuple(VAE_TINY["block_out_channels"]),
            layers_per_block=VAE_TINY["layers_per_block"],
            scaling_factor=VAE_TINY["scaling_factor"],
            dtype=jnp.float32,
        ),
        text_encoder=CLIPTextEncoder(
            vocab_size=CLIP_TINY["vocab_size"], width=64,
            layers=CLIP_TINY["num_hidden_layers"], heads=4,
            hidden_act="gelu", dtype=jnp.float32,
        ),
        tokenizer=tok,
        params=params,
        dtype=jnp.float32,
    )

    img_u8 = np.random.default_rng(14).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    steps, gs, nl = 3, 9.0, 5
    key = jax.random.PRNGKey(21)
    out_flax = pipe("a cat", img_u8, num_inference_steps=steps,
                    guidance_scale=gs, noise_level=nl, rng=key)

    # ---- torch twin of the published pipeline loop, same weights + noise
    twin_u = UNet2DConditionTwin(UNET_TINY)
    twin_u.load_state_dict(_torch(unet_sd), strict=True)
    twin_v = AutoencoderKLTwin(VAE_TINY)
    twin_v.load_state_dict(_torch(vae_sd), strict=True)
    twin_c = CLIPTextTwin(CLIP_TINY)
    twin_c.load_state_dict(_torch(clip_sd), strict=True)
    for m in (twin_u, twin_v, twin_c):
        m.eval()

    # the noise draws are INPUTS, not semantics under test: reproduce the
    # pipeline's key derivation to hand the twin identical arrays
    rng_prep, _rng_steps = jax.random.split(key)
    rng_lat, rng_aug = jax.random.split(rng_prep)
    img = img_u8.astype(np.float32) / 127.5 - 1.0
    aug_noise = np.asarray(jax.random.normal(rng_aug, (1, 8, 8, 3), jnp.float32))
    lat_noise = np.asarray(jax.random.normal(rng_lat, (1, 8, 8, 4), jnp.float32))

    with torch.no_grad():
        ids = torch.tensor(tok(["a cat"]).astype(np.int64))
        neg = torch.tensor(tok([""]).astype(np.int64))
        cond, uncond = twin_c(ids), twin_c(neg)

        acp_lr = _np_schedule(1e-4, 0.02)
        img_t = torch.tensor(img[None]).permute(0, 3, 1, 2)
        img_aug = (
            np.sqrt(acp_lr[nl]) * img_t
            + np.sqrt(1.0 - acp_lr[nl]) * torch.tensor(aug_noise).permute(0, 3, 1, 2)
        ).float()

        acp = _np_schedule(0.00085, 0.012)
        final_alpha = acp[0]  # set_alpha_to_one=False
        ratio = 1000 // steps
        ts = (np.arange(steps) * ratio)[::-1] + 1  # steps_offset=1
        x = torch.tensor(lat_noise).permute(0, 3, 1, 2)
        nl_t = torch.tensor([nl, nl], dtype=torch.int64)
        ctx2 = torch.cat([cond, uncond], dim=0)
        for t in ts:
            inp = torch.cat([x, img_aug], dim=1)
            inp2 = torch.cat([inp, inp], dim=0)
            t2 = torch.tensor([t, t], dtype=torch.int64)
            v2 = twin_u(inp2, t2, ctx2, nl_t)
            v_c, v_u = v2.chunk(2, dim=0)
            v = v_u + gs * (v_c - v_u)
            a_t = acp[t]
            tp = t - ratio
            a_prev = acp[tp] if tp >= 0 else final_alpha
            x0 = np.sqrt(a_t) * x - np.sqrt(1 - a_t) * v     # v-prediction
            eps = np.sqrt(a_t) * v + np.sqrt(1 - a_t) * x
            x = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps  # DDIM η=0
            x = x.float()
        out_t = twin_v.decode(x).clamp(-1, 1) * 0.5 + 0.5

    out_torch = out_t.permute(0, 2, 3, 1).numpy()
    assert out_flax.shape == out_torch.shape == (1, 16, 16, 3)
    mse = float(np.mean((out_flax - out_torch) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 50.0, f"pipeline twin parity only {psnr:.1f} dB"
