"""Diffusers-checkpoint importer for the SD x4-upscaler path.

Translates locally-available ``stabilityai/stable-diffusion-x4-upscaler``
weights (diffusers layout: ``unet/``, ``vae/``, ``text_encoder/`` with
``.safetensors`` or ``.bin`` state dicts) into this framework's Flax trees.
No weights can be downloaded in this environment, so correctness is enforced
two independent ways (tests/test_sd_import.py):

1. a round-trip test (export → re-import → exact tree equality), and
2. a NON-circular inventory check: ``ckpt/sd_inventory.py`` enumerates the
   published checkpoint's keys+shapes structurally (independent of this
   rule table), and :func:`translate_inventory` must map 100% of them onto
   exactly the Flax init tree of the model built from the same config.

Layout transforms: torch Conv OIHW → HWIO; Linear (O,I) → (I,O); norm
weight/bias → scale/bias; embeddings pass through.
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable

import numpy as np
import jax.numpy as jnp
from flax import traverse_util


def _conv_w(v):
    return np.transpose(v, (2, 3, 1, 0))


def _conv_w_inv(v):
    return np.transpose(v, (3, 2, 0, 1))


def _linear_w(v):
    return np.transpose(v, (1, 0))


_ID = lambda v: v

# (diffusers key regex → flax '/'-path template). `\g<n>` backrefs allowed.
# The transform is inferred from the leaf name + tensor rank.
_UNET_RULES: list[tuple[str, str]] = [
    (r"^conv_in\.(.*)$", r"conv_in/\1"),
    (r"^conv_out\.(.*)$", r"conv_out/\1"),
    (r"^conv_norm_out\.(.*)$", r"norm_out/\1"),
    (r"^time_embedding\.linear_1\.(.*)$", r"time_embed_0/\1"),
    (r"^time_embedding\.linear_2\.(.*)$", r"time_embed_1/\1"),
    # published x4-upscaler: noise-level table nn.Embedding(1000, 4*ch0)
    (r"^class_embedding\.weight$", r"class_embedding/embedding"),
    # timestep-style class embedding (class_embed_type="timestep" models)
    (r"^class_embedding\.linear_1\.(.*)$", r"class_embed_0/\1"),
    (r"^class_embedding\.linear_2\.(.*)$", r"class_embed_1/\1"),
    (r"^down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", r"down_\1_res_\2/\3"),
    (r"^down_blocks\.(\d+)\.attentions\.(\d+)\.(.*)$", r"down_\1_attn_\2/\3"),
    (r"^down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)$", r"down_\1_downsample/\2"),
    (r"^up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", r"up_\1_res_\2/\3"),
    (r"^up_blocks\.(\d+)\.attentions\.(\d+)\.(.*)$", r"up_\1_attn_\2/\3"),
    (r"^up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)$", r"up_\1_upsample/\2"),
    (r"^mid_block\.resnets\.0\.(.*)$", r"mid_res_0/\1"),
    (r"^mid_block\.resnets\.1\.(.*)$", r"mid_res_1/\1"),
    (r"^mid_block\.attentions\.0\.(.*)$", r"mid_attn/\1"),
]

def _rewrite_unet_tail(tail: str) -> str:
    """Sequential rewrites for names inside a resnet/transformer block."""
    t = tail
    t = re.sub(r"transformer_blocks\.(\d+)\.", r"block_\1.", t)
    t = re.sub(r"attn(\d)\.to_out\.0\.", r"attn\1.to_out.", t)
    t = re.sub(r"ff\.net\.0\.proj\.", r"ff.proj_in.", t)
    t = re.sub(r"ff\.net\.2\.", r"ff.proj_out.", t)
    return t.replace(".", "/")

_VAE_RULES: list[tuple[str, str]] = [
    (r"^(encoder|decoder)\.conv_in\.(.*)$", r"\1/conv_in/\2"),
    (r"^(encoder|decoder)\.conv_out\.(.*)$", r"\1/conv_out/\2"),
    (r"^(encoder|decoder)\.conv_norm_out\.(.*)$", r"\1/norm_out/\2"),
    (r"^encoder\.down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", r"encoder/down_\1_res_\2/\3"),
    (r"^encoder\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)$", r"encoder/down_\1_downsample/\2"),
    (r"^decoder\.up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", r"decoder/up_\1_res_\2/\3"),
    (r"^decoder\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)$", r"decoder/up_\1_upsample/\2"),
    (r"^(encoder|decoder)\.mid_block\.resnets\.0\.(.*)$", r"\1/mid_res_0/\2"),
    (r"^(encoder|decoder)\.mid_block\.resnets\.1\.(.*)$", r"\1/mid_res_1/\2"),
    (r"^(encoder|decoder)\.mid_block\.attentions\.0\.(.*)$", r"\1/mid_attn/\2"),
    (r"^quant_conv\.(.*)$", r"quant_conv/\1"),
    (r"^post_quant_conv\.(.*)$", r"post_quant_conv/\1"),
]

_CLIP_RULES: list[tuple[str, str]] = [
    (r"^text_model\.embeddings\.token_embedding\.weight$", r"token_embedding/embedding"),
    (r"^text_model\.embeddings\.position_embedding\.weight$", r"position_embedding"),
    (r"^text_model\.final_layer_norm\.(.*)$", r"ln_final/\1"),
    (r"^text_model\.encoder\.layers\.(\d+)\.self_attn\.(q|k|v|out)_proj\.(.*)$", r"block_\1/attn/\2_proj/\3"),
    (r"^text_model\.encoder\.layers\.(\d+)\.layer_norm1\.(.*)$", r"block_\1/ln1/\2"),
    (r"^text_model\.encoder\.layers\.(\d+)\.layer_norm2\.(.*)$", r"block_\1/ln2/\2"),
    (r"^text_model\.encoder\.layers\.(\d+)\.mlp\.fc1\.(.*)$", r"block_\1/mlp_fc/\2"),
    (r"^text_model\.encoder\.layers\.(\d+)\.mlp\.fc2\.(.*)$", r"block_\1/mlp_proj/\2"),
]


def _apply_rules(key: str, rules: list[tuple[str, str]]) -> str | None:
    for pat, repl in rules:
        m = re.match(pat, key)
        if m:
            return m.expand(repl)
    return None


def map_key(component: str, key: str) -> str | None:
    """Full diffusers-key → flax-'/'-path mapping (sans leaf rename), shared
    by :func:`convert_component` and :func:`translate_inventory`."""
    if component == "unet":
        path = _apply_rules(key, _UNET_RULES)
        if path is not None and "/" in path:
            head, tail = path.split("/", 1)
            path = f"{head}/{_rewrite_unet_tail(tail)}"
        return path
    if component == "vae":
        path = _apply_rules(key, _VAE_RULES)
        if path is not None:
            if "mid_attn/" in path:
                head, tail = path.rsplit("mid_attn/", 1)
                tail = re.sub(r"^group_norm\.", "norm.", tail)
                # published x4-upscaler VAE uses the LEGACY AttentionBlock
                # names (query/key/value/proj_attn); newer exports use
                # to_q/to_k/to_v/to_out.0 — both map to this VAEAttention
                tail = re.sub(r"^query\.", "to_q.", tail)
                tail = re.sub(r"^key\.", "to_k.", tail)
                tail = re.sub(r"^value\.", "to_v.", tail)
                tail = re.sub(r"^proj_attn\.", "to_out.", tail)
                tail = re.sub(r"^to_out\.0\.", "to_out.", tail)
                path = f"{head}mid_attn/{tail}"
            path = path.replace(".", "/")
        return path
    return _apply_rules(key, _CLIP_RULES)


def _leaf_transform(flax_path: str, v: np.ndarray) -> tuple[str, np.ndarray]:
    """Rename the leaf (weight→kernel/scale) and fix the layout by rank."""
    parts = flax_path.split("/")
    leaf = parts[-1]
    if leaf == "weight":
        if v.ndim == 4:
            return "/".join(parts[:-1] + ["kernel"]), _conv_w(v)
        if v.ndim == 2:
            return "/".join(parts[:-1] + ["kernel"]), _linear_w(v)
        # 1-D weight on a norm layer
        return "/".join(parts[:-1] + ["scale"]), v
    if leaf == "bias":
        return flax_path, v
    return flax_path, v  # embeddings etc.


def convert_component(state_dict: dict[str, Any], component: str, strict: bool = True):
    """component: 'unet' | 'vae' | 'text_encoder'. Returns (tree, unused)."""
    flat: dict[tuple[str, ...], jnp.ndarray] = {}
    unused: list[str] = []
    for key, value in state_dict.items():
        v = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        path = map_key(component, key)
        if path is None:
            unused.append(key)
            if strict:
                raise KeyError(f"cannot translate {component} key {key!r}")
            continue
        path, v = _leaf_transform(path, v)
        flat[tuple(path.split("/"))] = jnp.asarray(v, jnp.float32)
    return traverse_util.unflatten_dict(flat), unused


def translate_inventory(
    component: str, shapes: dict[str, tuple]
) -> dict[tuple[str, ...], tuple]:
    """Shape-level dry run of the importer: map every diffusers key of a
    vendored inventory (``ckpt/sd_inventory.py``) to its Flax path and the
    post-layout-transform shape, WITHOUT materialising tensors. Raises on any
    untranslatable key — the non-circular coverage check."""
    from dgm_img_super_resolution_tpu.ckpt.sd_inventory import IGNORABLE_KEYS

    out: dict[tuple[str, ...], tuple] = {}
    for key, shape in shapes.items():
        if key in IGNORABLE_KEYS:
            continue
        path = map_key(component, key)
        if path is None:
            raise KeyError(f"importer drops {component} key {key!r}")
        parts = path.split("/")
        leaf = parts[-1]
        if leaf == "weight":
            if len(shape) == 4:  # conv OIHW → HWIO
                o, i, kh, kw = shape
                out[tuple(parts[:-1] + ["kernel"])] = (kh, kw, i, o)
            elif len(shape) == 2:  # linear (O,I) → (I,O)
                out[tuple(parts[:-1] + ["kernel"])] = (shape[1], shape[0])
            else:  # norm scale
                out[tuple(parts[:-1] + ["scale"])] = shape
        else:
            out[tuple(parts)] = shape
    return out


def _read_state_dict(component_dir: str) -> dict[str, np.ndarray]:
    for name in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "diffusion_pytorch_model.bin",
        "pytorch_model.bin",
    ):
        path = os.path.join(component_dir, name)
        if os.path.exists(path):
            if path.endswith(".safetensors"):
                from safetensors.numpy import load_file

                return load_file(path)
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no state dict in {component_dir}")


def _read_json(path: str) -> dict | None:
    import json

    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    return None


def load_sd_x4_pipeline(ckpt_dir: str, dtype=jnp.bfloat16):
    """Build a StableDiffusionUpscalePipeline from a local diffusers checkout
    (``unet/``, ``vae/``, ``text_encoder/``, ``tokenizer/`` subdirs).

    The checkout's own ``scheduler/scheduler_config.json`` and
    ``low_res_scheduler/scheduler_config.json`` override the vendored
    defaults when present, so day-one correctness of prediction type and
    betas does not depend on the vendored copies
    (``ckpt/sd_inventory.py``)."""
    from dgm_img_super_resolution_tpu.models.sd.clip import SimpleTokenizer
    from dgm_img_super_resolution_tpu.models.sd.pipeline import StableDiffusionUpscalePipeline

    unet_tree, _ = convert_component(_read_state_dict(os.path.join(ckpt_dir, "unet")), "unet", strict=False)
    vae_tree, _ = convert_component(_read_state_dict(os.path.join(ckpt_dir, "vae")), "vae", strict=False)
    text_tree, _ = convert_component(
        _read_state_dict(os.path.join(ckpt_dir, "text_encoder")), "text_encoder", strict=False
    )
    # a diffusers checkout ships the HF tokenizer files; the OpenAI merge
    # list is accepted as an alternative
    tok_dir = os.path.join(ckpt_dir, "tokenizer")
    bpe = os.path.join(tok_dir, "bpe_simple_vocab_16e6.txt.gz")
    tokenizer = SimpleTokenizer(
        bpe_path=bpe if os.path.exists(bpe) else None,
        vocab_json=os.path.join(tok_dir, "vocab.json"),
        merges_txt=os.path.join(tok_dir, "merges.txt"),
    )
    params = {"unet": unet_tree, "vae": vae_tree, "text_encoder": text_tree}
    return StableDiffusionUpscalePipeline(
        params=params,
        tokenizer=tokenizer,
        dtype=dtype,
        scheduler_config=_read_json(
            os.path.join(ckpt_dir, "scheduler", "scheduler_config.json")
        ),
        low_res_scheduler_config=_read_json(
            os.path.join(ckpt_dir, "low_res_scheduler", "scheduler_config.json")
        ),
    )
