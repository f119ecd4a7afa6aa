"""Unconditional DDPM (train + ancestral sampling) for the from-scratch
``basic_diffusion`` capability (reference README.md:15; notebook blob missing,
architecture per ``basic_diffusion_model.png``).

Shares the :class:`~.schedule.Schedule` pytree with the SRDiff path; the
sampler is again a single jitted ``lax.scan``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from dgm_img_super_resolution_tpu.diffusion.schedule import Schedule, extract


class DDPM:
    def __init__(self, model, schedule: Schedule, clip_denoised: bool = True):
        self.model = model
        self.schedule = schedule
        self.num_timesteps = schedule.num_timesteps
        self.clip_denoised = clip_denoised

    def _apply(self, params, x, t):
        return self.model.apply({"params": params}, x, t).astype(jnp.float32)

    def q_sample(self, x_start, t, noise):
        s = self.schedule
        nd = x_start.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def loss(self, params, x_start, rng):
        """Simple DDPM objective: L2 on predicted noise."""
        b = x_start.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(rng_n, x_start.shape, jnp.float32)
        x_t = self.q_sample(x_start, t, noise)
        pred = self._apply(params, x_t, t)
        return jnp.mean((noise - pred) ** 2)

    def p_sample_step(self, params, x, t, rng):
        s = self.schedule
        nd = x.ndim
        eps = self._apply(params, x, t)
        x0 = (
            extract(s.sqrt_recip_alphas_cumprod, t, nd) * x
            - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )
        if self.clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (
            extract(s.posterior_mean_coef1, t, nd) * x0
            + extract(s.posterior_mean_coef2, t, nd) * x
        )
        logvar = extract(s.posterior_log_variance_clipped, t, nd)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype).reshape(x.shape[0], *((1,) * (nd - 1)))
        return mean + nonzero * jnp.exp(0.5 * logvar) * noise

    def sample(self, params, shape, rng):
        rng_init, rng_steps = jax.random.split(rng)
        x = jax.random.normal(rng_init, shape, jnp.float32)
        b = shape[0]

        def step(x, ti):
            t = jnp.full((b,), ti, jnp.int32)
            return self.p_sample_step(params, x, t, jax.random.fold_in(rng_steps, ti)), None

        x, _ = jax.lax.scan(step, x, jnp.arange(self.num_timesteps - 1, -1, -1))
        return x
