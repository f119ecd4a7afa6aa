"""PyTorch-checkpoint importer for the upstream SRDiff weights.

The downloadable upstream checkpoint (``model_ckpt_steps_400000.ckpt``,
reference ``README.md:63``) stores a torch state_dict with keys
``denoise_fn.*`` (UNet) and ``rrdb.*`` (encoder) plus diffusion buffers
(reference ``st_app1.py:1645-1648``; schema written by ``save_checkpoint``,
``model.py:1439-1450``). This module translates those keys/layouts into this
framework's NHWC Flax param pytrees:

- ``Conv2d.weight (O,I,kh,kw)``          → ``kernel (kh,kw,I,O)``
- ``ConvTranspose2d.weight (I,O,kh,kw)`` → spatially flipped ``kernel
  (kh,kw,I,O)`` (see ``models.layers.ConvTranspose2dTorch``)
- ``Linear.weight (O,I)``               → ``kernel (I,O)``
- ``GroupNorm.weight/bias``             → ``scale/bias``
- diffusion buffers (betas, …) are skipped — recomputed by ``make_schedule``.

``export_srdiff_to_torch_keys`` is the exact inverse, used for round-trip
tests and for exporting trained weights back to the reference's schema.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np
import jax.numpy as jnp
from flax import traverse_util


# --------------------------------------------------------------- transforms
def _conv_w(v: np.ndarray) -> np.ndarray:
    return np.transpose(v, (2, 3, 1, 0))


def _conv_w_inv(v: np.ndarray) -> np.ndarray:
    return np.transpose(v, (3, 2, 0, 1))


def _convt_w(v: np.ndarray) -> np.ndarray:
    return np.transpose(v[:, :, ::-1, ::-1], (2, 3, 0, 1))


def _convt_w_inv(v: np.ndarray) -> np.ndarray:
    return np.transpose(v, (2, 3, 0, 1))[:, :, ::-1, ::-1].copy()


def _linear_w(v: np.ndarray) -> np.ndarray:
    return np.transpose(v, (1, 0))


_ID = lambda v: v

# Each rule: (torch-key regex, flax path template, fwd transform, inv transform)
# applied to the `.weight` tensor; `.bias` copies through unchanged with the
# same path ending in "bias".
_RESNET_INNER = [
    (r"mlp\.1\.weight$", "{}/mlp/kernel", _linear_w, _linear_w),
    (r"mlp\.1\.bias$", "{}/mlp/bias", _ID, _ID),
    (r"block1\.block\.1\.weight$", "{}/block1/conv/kernel", _conv_w, _conv_w_inv),
    (r"block1\.block\.1\.bias$", "{}/block1/conv/bias", _ID, _ID),
    (r"block1\.block\.2\.weight$", "{}/block1/norm/scale", _ID, _ID),
    (r"block1\.block\.2\.bias$", "{}/block1/norm/bias", _ID, _ID),
    (r"block2\.block\.1\.weight$", "{}/block2/conv/kernel", _conv_w, _conv_w_inv),
    (r"block2\.block\.1\.bias$", "{}/block2/conv/bias", _ID, _ID),
    (r"block2\.block\.2\.weight$", "{}/block2/norm/scale", _ID, _ID),
    (r"block2\.block\.2\.bias$", "{}/block2/norm/bias", _ID, _ID),
    (r"res_conv\.weight$", "{}/res_conv/kernel", _conv_w, _conv_w_inv),
    (r"res_conv\.bias$", "{}/res_conv/bias", _ID, _ID),
]


def _translate_unet_key(key: str):
    """torch ``denoise_fn.…`` key → (flax '/'-joined path, fwd, inv)."""
    m = re.match(r"^cond_proj\.(weight|bias)$", key)
    if m:
        if m.group(1) == "weight":
            return "cond_proj/kernel", _convt_w, _convt_w_inv
        return "cond_proj/bias", _ID, _ID
    m = re.match(r"^mlp\.([02])\.(weight|bias)$", key)
    if m:
        idx = "mlp_0" if m.group(1) == "0" else "mlp_1"
        if m.group(2) == "weight":
            return f"{idx}/kernel", _linear_w, _linear_w
        return f"{idx}/bias", _ID, _ID
    m = re.match(r"^(downs|ups)\.(\d+)\.([012])\.(.*)$", key)
    if m:
        kind, i, slot, rest = m.group(1), int(m.group(2)), m.group(3), m.group(4)
        stage = "down" if kind == "downs" else "up"
        if slot in ("0", "1"):
            base = f"{stage}_{i}_res{int(slot) + 1}"
            for pat, tmpl, fwd, inv in _RESNET_INNER:
                if re.match(pat, rest):
                    return tmpl.format(base), fwd, inv
            return None
        # slot 2: Downsample Sequential(pad, conv) / Upsample Sequential(convT)
        if kind == "downs":
            m2 = re.match(r"^conv\.1\.(weight|bias)$", rest)
            if m2:
                if m2.group(1) == "weight":
                    return f"down_{i}_downsample/conv/kernel", _conv_w, _conv_w_inv
                return f"down_{i}_downsample/conv/bias", _ID, _ID
        else:
            m2 = re.match(r"^conv\.0\.(weight|bias)$", rest)
            if m2:
                if m2.group(1) == "weight":
                    return f"up_{i}_upsample/conv/kernel", _convt_w, _convt_w_inv
                return f"up_{i}_upsample/conv/bias", _ID, _ID
        return None
    m = re.match(r"^(mid_block1|mid_block2)\.(.*)$", key)
    if m:
        for pat, tmpl, fwd, inv in _RESNET_INNER:
            if re.match(pat, m.group(2)):
                return tmpl.format(m.group(1)), fwd, inv
        return None
    # Residual(Rezero(LinearAttention)): fn.g gate; fn.fn.to_qkv / fn.fn.to_out
    m = re.match(r"^mid_attn\.fn\.g$", key)
    if m:
        return "mid_attn_g", _ID, _ID
    m = re.match(r"^mid_attn\.fn\.fn\.(to_qkv|to_out)\.(weight|bias)$", key)
    if m:
        if m.group(2) == "weight":
            return f"mid_attn/{m.group(1)}/kernel", _conv_w, _conv_w_inv
        return f"mid_attn/{m.group(1)}/bias", _ID, _ID
    m = re.match(r"^up_proj\.1\.(weight|bias)$", key)
    if m:
        if m.group(1) == "weight":
            return "up_proj/kernel", _conv_w, _conv_w_inv
        return "up_proj/bias", _ID, _ID
    m = re.match(r"^final_conv\.0\.block\.1\.(weight|bias)$", key)
    if m:
        if m.group(1) == "weight":
            return "final_block/conv/kernel", _conv_w, _conv_w_inv
        return "final_block/conv/bias", _ID, _ID
    m = re.match(r"^final_conv\.0\.block\.2\.(weight|bias)$", key)
    if m:
        return f"final_block/norm/{'scale' if m.group(1) == 'weight' else 'bias'}", _ID, _ID
    m = re.match(r"^final_conv\.1\.(weight|bias)$", key)
    if m:
        if m.group(1) == "weight":
            return "final_conv/kernel", _conv_w, _conv_w_inv
        return "final_conv/bias", _ID, _ID
    return None


def _translate_rrdb_key(key: str):
    m = re.match(r"^RRDB_trunk\.(\d+)\.(RDB\d)\.(conv\d)\.(weight|bias)$", key)
    if m:
        base = f"RRDB_trunk_{m.group(1)}/{m.group(2)}/{m.group(3)}"
        if m.group(4) == "weight":
            return f"{base}/kernel", _conv_w, _conv_w_inv
        return f"{base}/bias", _ID, _ID
    m = re.match(r"^(conv_first|trunk_conv|upconv1|upconv2|upconv3|HRconv|conv_last)\.(weight|bias)$", key)
    if m:
        if m.group(2) == "weight":
            return f"{m.group(1)}/kernel", _conv_w, _conv_w_inv
        return f"{m.group(1)}/bias", _ID, _ID
    return None


_SKIP_BUFFERS = re.compile(
    r"^(betas|alphas_cumprod|alphas_cumprod_prev|sqrt_alphas_cumprod|"
    r"sqrt_one_minus_alphas_cumprod|log_one_minus_alphas_cumprod|"
    r"sqrt_recip_alphas_cumprod|sqrt_recipm1_alphas_cumprod|posterior_variance|"
    r"posterior_log_variance_clipped|posterior_mean_coef1|posterior_mean_coef2|"
    r"ssim_loss\..*)$"
)


def convert_srdiff_state_dict(
    state_dict: dict[str, Any], strict: bool = True
) -> tuple[dict, list[str]]:
    """Translate a torch SRDiff ``GaussianDiffusion`` state_dict into
    ``{"denoise_fn": tree, "rrdb": tree}``. Returns ``(params, unused_keys)``.

    Accepts an optional ``model.`` prefix on every key (the reference's
    ``save_checkpoint`` nests under ``state_dict["model"]`` and its
    ``load_ckpt`` strips prefixes — ``model.py:1463-1496``).
    """
    flat: dict[tuple[str, ...], jnp.ndarray] = {}
    unused: list[str] = []
    for key, value in state_dict.items():
        v = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        k = key[len("model.") :] if key.startswith("model.") else key
        if _SKIP_BUFFERS.match(k):
            continue
        if k.startswith("denoise_fn."):
            tr = _translate_unet_key(k[len("denoise_fn.") :])
            root = "denoise_fn"
        elif k.startswith("rrdb."):
            tr = _translate_rrdb_key(k[len("rrdb.") :])
            root = "rrdb"
        else:
            tr = None
            root = ""
        if tr is None:
            unused.append(key)
            if strict:
                raise KeyError(f"cannot translate checkpoint key {key!r}")
            continue
        path, fwd, _ = tr
        flat[(root, *path.split("/"))] = jnp.asarray(fwd(v), jnp.float32)
    return traverse_util.unflatten_dict(flat), unused


def export_srdiff_to_torch_keys(params: dict) -> dict[str, np.ndarray]:
    """Inverse translation (framework params → reference torch key schema)."""
    out: dict[str, np.ndarray] = {}
    flat = traverse_util.flatten_dict(params)
    for path, v in flat.items():
        v = np.asarray(v)
        root, rest = path[0], "/".join(path[1:])
        found = False
        candidates = _enumerate_torch_keys(root, rest, v)
        for tk, inv in candidates:
            out[tk] = inv(v)
            found = True
            break
        if not found:
            raise KeyError(f"cannot export param path {path}")
    return out


def _enumerate_torch_keys(root: str, rest: str, v: np.ndarray):
    """Yield (torch_key, inverse_transform) for a flax path — by inverting the
    same rule tables (search over the translation maps)."""
    if root == "denoise_fn":
        gen = _unet_torch_key_candidates(rest)
        prefix = "denoise_fn."
    else:
        gen = _rrdb_torch_key_candidates(rest)
        prefix = "rrdb."
    for tk, inv in gen:
        yield prefix + tk, inv


def _unet_torch_key_candidates(rest: str):
    mapping = {
        "cond_proj/kernel": ("cond_proj.weight", _convt_w_inv),
        "cond_proj/bias": ("cond_proj.bias", _ID),
        "mlp_0/kernel": ("mlp.0.weight", _linear_w),
        "mlp_0/bias": ("mlp.0.bias", _ID),
        "mlp_1/kernel": ("mlp.2.weight", _linear_w),
        "mlp_1/bias": ("mlp.2.bias", _ID),
        "mid_attn_g": ("mid_attn.fn.g", _ID),
        "up_proj/kernel": ("up_proj.1.weight", _conv_w_inv),
        "up_proj/bias": ("up_proj.1.bias", _ID),
        "final_block/conv/kernel": ("final_conv.0.block.1.weight", _conv_w_inv),
        "final_block/conv/bias": ("final_conv.0.block.1.bias", _ID),
        "final_block/norm/scale": ("final_conv.0.block.2.weight", _ID),
        "final_block/norm/bias": ("final_conv.0.block.2.bias", _ID),
        "final_conv/kernel": ("final_conv.1.weight", _conv_w_inv),
        "final_conv/bias": ("final_conv.1.bias", _ID),
    }
    if rest in mapping:
        yield mapping[rest]
        return
    m = re.match(r"^mid_attn/(to_qkv|to_out)/(kernel|bias)$", rest)
    if m:
        suffix = "weight" if m.group(2) == "kernel" else "bias"
        inv = _conv_w_inv if suffix == "weight" else _ID
        yield f"mid_attn.fn.fn.{m.group(1)}.{suffix}", inv
        return
    m = re.match(r"^(down|up)_(\d+)_(res[12]|downsample|upsample)/(.*)$", rest)
    if m:
        stage, i, part, inner = m.group(1), m.group(2), m.group(3), m.group(4)
        kind = "downs" if stage == "down" else "ups"
        if part in ("res1", "res2"):
            slot = "0" if part == "res1" else "1"
            inner_map = {
                "mlp/kernel": ("mlp.1.weight", _linear_w),
                "mlp/bias": ("mlp.1.bias", _ID),
                "block1/conv/kernel": ("block1.block.1.weight", _conv_w_inv),
                "block1/conv/bias": ("block1.block.1.bias", _ID),
                "block1/norm/scale": ("block1.block.2.weight", _ID),
                "block1/norm/bias": ("block1.block.2.bias", _ID),
                "block2/conv/kernel": ("block2.block.1.weight", _conv_w_inv),
                "block2/conv/bias": ("block2.block.1.bias", _ID),
                "block2/norm/scale": ("block2.block.2.weight", _ID),
                "block2/norm/bias": ("block2.block.2.bias", _ID),
                "res_conv/kernel": ("res_conv.weight", _conv_w_inv),
                "res_conv/bias": ("res_conv.bias", _ID),
            }
            if inner in inner_map:
                tk, inv = inner_map[inner]
                yield f"{kind}.{i}.{slot}.{tk}", inv
            return
        if part == "downsample":
            m2 = re.match(r"^conv/(kernel|bias)$", inner)
            if m2:
                suffix = "weight" if m2.group(1) == "kernel" else "bias"
                inv = _conv_w_inv if suffix == "weight" else _ID
                yield f"downs.{i}.2.conv.1.{suffix}", inv
            return
        if part == "upsample":
            m2 = re.match(r"^conv/(kernel|bias)$", inner)
            if m2:
                suffix = "weight" if m2.group(1) == "kernel" else "bias"
                inv = _convt_w_inv if suffix == "weight" else _ID
                yield f"ups.{i}.2.conv.0.{suffix}", inv
            return
    m = re.match(r"^(mid_block1|mid_block2)/(.*)$", rest)
    if m:
        inner_map = {
            "mlp/kernel": ("mlp.1.weight", _linear_w),
            "mlp/bias": ("mlp.1.bias", _ID),
            "block1/conv/kernel": ("block1.block.1.weight", _conv_w_inv),
            "block1/conv/bias": ("block1.block.1.bias", _ID),
            "block2/conv/kernel": ("block2.block.1.weight", _conv_w_inv),
            "block2/conv/bias": ("block2.block.1.bias", _ID),
            "res_conv/kernel": ("res_conv.weight", _conv_w_inv),
            "res_conv/bias": ("res_conv.bias", _ID),
        }
        if m.group(2) in inner_map:
            tk, inv = inner_map[m.group(2)]
            yield f"{m.group(1)}.{tk}", inv
        return


def _rrdb_torch_key_candidates(rest: str):
    m = re.match(r"^RRDB_trunk_(\d+)/(RDB\d)/(conv\d)/(kernel|bias)$", rest)
    if m:
        suffix = "weight" if m.group(4) == "kernel" else "bias"
        inv = _conv_w_inv if suffix == "weight" else _ID
        yield f"RRDB_trunk.{m.group(1)}.{m.group(2)}.{m.group(3)}.{suffix}", inv
        return
    m = re.match(
        r"^(conv_first|trunk_conv|upconv1|upconv2|upconv3|HRconv|conv_last)/(kernel|bias)$", rest
    )
    if m:
        suffix = "weight" if m.group(2) == "kernel" else "bias"
        inv = _conv_w_inv if suffix == "weight" else _ID
        yield f"{m.group(1)}.{suffix}", inv
        return


def import_srdiff_checkpoint(path: str, strict: bool = True) -> tuple[dict, int]:
    """Load the upstream ``model_ckpt_steps_*.ckpt`` (torch pickle) and return
    ``(params, global_step)``."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    if "model" in state_dict and isinstance(state_dict["model"], dict):
        state_dict = state_dict["model"]
    params, unused = convert_srdiff_state_dict(state_dict, strict=strict)
    if unused:
        print(f"| torch import: {len(unused)} unused keys (e.g. {unused[:3]})")
    return params, int(ckpt.get("global_step", 0))


# ----------------------------------------------------------------- LPIPS
# The reference scores LPIPS via the `lpips` pip package with an AlexNet
# backbone (`lpips.LPIPS(net='alex')`, reference srdiff/model.py:1501,
# 1530-1535). That package's state_dict layout:
#   scaling_layer.shift/scale       — fixed constants (checked, not stored)
#   net.slice{1..5}.{idx}.weight/bias — torchvision alexnet convs at their
#     original `features` indices (0, 3, 6, 8, 10)
#   lin{0..4}.model.1.weight        — 1×1 no-bias linear heads
# This maps onto metrics/lpips.py::_LPIPSNet exactly.

_LPIPS_SLICES = {  # slice name -> (torchvision features idx, flax conv name)
    "slice1": (0, "conv1"),
    "slice2": (3, "conv2"),
    "slice3": (6, "conv3"),
    "slice4": (8, "conv4"),
    "slice5": (10, "conv5"),
}

_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def convert_lpips_state_dict(state_dict: dict, strict: bool = True) -> dict:
    """Translate an `lpips.LPIPS(net='alex')` torch state_dict into the
    param pytree of ``metrics.lpips._LPIPSNet``."""
    flat: dict[tuple[str, ...], jnp.ndarray] = {}
    unused: list[str] = []
    for key, v in state_dict.items():
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        m = re.match(r"^net\.(slice\d)\.(\d+)\.(weight|bias)$", key)
        if m:
            sl, idx, kind = m.group(1), int(m.group(2)), m.group(3)
            if sl not in _LPIPS_SLICES:
                raise ValueError(f"unrecognised LPIPS slice in key {key}")
            want_idx, conv = _LPIPS_SLICES[sl]
            if idx != want_idx:
                raise ValueError(f"unexpected layer index in {key} (want {want_idx})")
            if kind == "weight":
                flat[("alex", conv, "kernel")] = jnp.asarray(_conv_w(v))
            else:
                flat[("alex", conv, "bias")] = jnp.asarray(v)
            continue
        m = re.match(r"^lin(\d)\.model\.(\d+)\.weight$", key)
        if m:
            flat[(f"lin{m.group(1)}", "kernel")] = jnp.asarray(_conv_w(v))
            continue
        if key == "scaling_layer.shift":
            if not np.allclose(v.reshape(-1), _LPIPS_SHIFT, atol=1e-6):
                raise ValueError(f"scaling_layer.shift {v.reshape(-1)} != LPIPS constants")
            continue
        if key == "scaling_layer.scale":
            if not np.allclose(v.reshape(-1), _LPIPS_SCALE, atol=1e-6):
                raise ValueError(f"scaling_layer.scale {v.reshape(-1)} != LPIPS constants")
            continue
        unused.append(key)
    if strict and unused:
        raise ValueError(f"unrecognised LPIPS keys: {unused[:5]}")
    expected = {("alex", c, p) for _, c in _LPIPS_SLICES.values() for p in ("kernel", "bias")}
    expected |= {(f"lin{i}", "kernel") for i in range(5)}
    missing = expected - set(flat)
    if missing:
        raise ValueError(f"LPIPS state_dict missing params: {sorted(missing)[:5]}")
    return {"params": traverse_util.unflatten_dict(flat)}


def import_lpips(path: str):
    """Load a torch ``lpips``-package checkpoint (full ``LPIPS(net='alex')``
    state_dict) and return a ready :class:`metrics.lpips.LPIPS` scorer."""
    import torch

    from dgm_img_super_resolution_tpu.metrics.lpips import LPIPS

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return LPIPS(convert_lpips_state_dict(sd))
