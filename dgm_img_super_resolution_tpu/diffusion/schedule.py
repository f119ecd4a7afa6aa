"""Diffusion noise schedules and the precomputed buffer pytree.

All seven schedule variants of the reference (``srdiff/model.py:872-908``):
``quad | linear | warmup10 | warmup50 | const | jsd`` plus the Nichol–Dhariwal
``cosine`` schedule (SRDiff default: cosine, s=0.008, T=100).

The eleven derived buffers the reference registers on its ``GaussianDiffusion``
module (``model.py:938-959``) live here in a single immutable
:class:`Schedule` pytree, computed once in float64 and stored float32. On TPU
the whole pytree (~11 × T floats) is HBM-resident and indexed inside the
sampling ``lax.scan`` — no host sync per step.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


def _warmup_beta(beta_start: float, beta_end: float, timesteps: int, frac: float) -> np.ndarray:
    betas = beta_end * np.ones(timesteps, dtype=np.float64)
    warmup = int(timesteps * frac)
    betas[:warmup] = np.linspace(beta_start, beta_end, warmup, dtype=np.float64)
    return betas


def get_beta_schedule(
    timesteps: int,
    beta_schedule: str = "linear",
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
) -> np.ndarray:
    if beta_schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, timesteps, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)
    elif beta_schedule == "warmup10":
        betas = _warmup_beta(beta_start, beta_end, timesteps, 0.1)
    elif beta_schedule == "warmup50":
        betas = _warmup_beta(beta_start, beta_end, timesteps, 0.5)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(timesteps, dtype=np.float64)
    elif beta_schedule == "jsd":
        betas = 1.0 / np.linspace(timesteps, 1, timesteps, dtype=np.float64)
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (timesteps,)
    return betas


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


@struct.dataclass
class Schedule:
    """Precomputed diffusion buffers (each shape ``(T,)`` float32)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(
    timesteps: int = 100,
    beta_schedule: str = "cosine",
    beta_s: float = 0.008,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
    res: bool = True,
) -> Schedule:
    """Build a :class:`Schedule`. In residual mode with a linear schedule the
    last beta is forced to 0.999 (reference ``model.py:925-926``)."""
    if beta_schedule == "cosine":
        betas = cosine_beta_schedule(timesteps, s=beta_s)
    else:
        betas = get_beta_schedule(timesteps, beta_schedule, beta_start, beta_end)
        if res and beta_schedule == "linear":
            betas = betas.copy()
            betas[-1] = 0.999

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return Schedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
    )


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-batch schedule values and broadcast to an ``ndim`` tensor
    (reference ``extract``, ``model.py:860-863``). ``t``: (N,) int."""
    out = a[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))
