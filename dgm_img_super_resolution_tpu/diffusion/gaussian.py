"""Gaussian diffusion (SRDiff residual regime) as pure jittable functions.

Capability twin of the reference ``GaussianDiffusion`` (``srdiff/model.py:
911-1134``), re-architected for XLA:

- No module state: parameters and PRNG keys are explicit arguments; schedule
  buffers live in an immutable :class:`~..diffusion.schedule.Schedule` pytree.
- **The ancestral sampler is a single jitted ``lax.scan`` over all T steps**
  (the reference runs a tqdm Python loop with one host sync per step,
  ``model.py:1076-1086``). The RRDB condition is computed once outside the
  scan; per-step noise comes from ``jax.random.fold_in`` — no host RNG.
- Residual regime: ``img2res``/``res2img`` with ``res_rescale`` and input
  clipping exactly as ``model.py:1118-1134``.
- ``q_sample`` keeps the reference's t = −1 convention (returns ``x_start``
  unchanged, ``model.py:1041-1048``) via a mask — needed by ``p_losses``
  which draws x_t at both t and t−1.
- A DDIM sampler (stride-able, deterministic at η=0) is added for the
  fast-inference path; it shares the schedule pytree.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp

from dgm_img_super_resolution_tpu.diffusion.schedule import Schedule, extract
from dgm_img_super_resolution_tpu.metrics.psnr_ssim import ssim as ssim_loss


def pad_carry_lanes() -> int:
    """Lane padding for the sampler carry (0 disables).

    The carried image is (B,H,W,3); a C=3 minor dim tiles catastrophically
    on TPU — the profiled op-point step spent ~18% in its layout round-trip
    (an f32→bf16 convert at 14 GiB/s, a standalone pad feeding the stem
    kernel, two f32 relayout copies at the scan-carry boundary, and the
    final 64→3 conv writing a `{0,3,2,1}` layout at 5.6 TFLOP/s). Padding
    the carry to 4 lanes removes every C=3 tensor from the scan.

    Exactness: lane 3 is *identically zero* through the whole chain — the
    initial x and every per-step noise draw happen at the true channel
    count and are zero-padded (so the random stream is unchanged), the
    UNet's final conv zero-pads its output (models/unet.py pad_out), and
    the stem chain kernel zero-pads its weights' input dim. The padded
    sampler computes the same math on the true lanes; per-step components
    are bitwise equal, and the compiled chain agrees to XLA re-fusion
    rounding (~1e-6 over 8 steps; pinned by tests/test_diffusion.py).

    Measured (real v5e, op point ddim20/η=1/512², two A/B sessions): the
    profiled 18% did NOT convert to throughput — XLA hides most of the
    layout traffic behind compute — but batch-8 p50 latency reproducibly
    improves ~2% (0.958–0.963 s vs 0.978–0.984 s) while throughput moves
    within noise (−0.7%/+0.8% across sessions). Default ON for the latency
    win. Env: DGMSR_PAD_CARRY=0 to disable.
    """
    return 0 if os.environ.get("DGMSR_PAD_CARRY", "1") in ("0", "false") else 4


def flat_carry() -> bool:
    """Carry the sampler scan state as (B, H, W·C) instead of (B, H, W, C).

    Even with the carry lane-padded to 4 channels (:func:`pad_carry_lanes`),
    the profiled op-point step (tools/profile_scan.py, ddim20/η=1/512² B=8)
    still spent ~5.6 ms/step — 14% — on pure layout traffic: XLA lays the
    C=4-minor f32 elementwise update out W-minor (``{2,3,1,0:T(4,128)}``,
    512 W positions as lanes) while the scan carry and the UNet want
    C-minor ``{3,2,1,0:T(8,128)}``, so every step paid two relayout copies
    (1.6 + 1.5 ms at 38–42 GiB/s) plus a 2.4 ms convert at 19 GiB/s.

    Flattening (W, C) into one 2048-wide minor dim makes the lane-dense
    layout the only sensible choice for the update math; the 3D↔4D
    reshapes land in the same memory order and fuse with the f32↔bf16
    converts at the UNet boundary. Elementwise math is shape-agnostic, so
    the flat sampler is exactly the lane-padded sampler (same per-element
    operations, same noise stream — noise is drawn at the 4D true-channel
    shape and reshaped); equality is pinned in tests/test_diffusion.py.

    Measured (real v5e, op point ddim20/η=1/512² B=8, two A/B repeats):
    8.57 → 9.65 img/s/chip (+12.5%), batch-8 p50 0.955 → 0.851 s, batch-1
    p50 0.466 → 0.452 s. Default ON. Env: DGMSR_FLAT_CARRY=0 to disable.
    """
    return os.environ.get("DGMSR_FLAT_CARRY", "1") not in ("0", "false")


def _lane_pad(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Zero-pad the trailing (channel) dim of x to n lanes (no-op if wider)."""
    if n <= x.shape[-1]:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, n - x.shape[-1]),))


def _lane_noise(rng: jax.Array, shape, true_c: int | None, dtype=jnp.float32,
                out_shape=None):
    """Gaussian noise drawn at the TRUE channel count, zero-padded to the
    carry's lane count — keeps the random stream independent of padding.
    ``out_shape`` reshapes the result (the flat-carry path draws at the 4D
    image shape so the stream matches, then flattens to the carry shape)."""
    c = true_c or shape[-1]
    noise = jax.random.normal(rng, tuple(shape[:-1]) + (c,), dtype)
    noise = _lane_pad(noise, shape[-1])
    return noise if out_shape is None else noise.reshape(out_shape)


def noise_like(rng: jax.Array, shape, repeat: bool = False) -> jnp.ndarray:
    """Batch of gaussian noise; ``repeat=True`` draws one sample and repeats
    it across the batch (reference ``noise_like``, ``model.py:866-869``)."""
    if repeat:
        one = jax.random.normal(rng, (1,) + tuple(shape[1:]), jnp.float32)
        return jnp.broadcast_to(one, tuple(shape))
    return jax.random.normal(rng, tuple(shape), jnp.float32)


class GaussianDiffusion:
    """Holds static config + module references; every method is pure."""

    def __init__(
        self,
        denoise_fn,
        rrdb_net=None,
        schedule: Schedule | None = None,
        *,
        loss_type: str = "l1",
        res: bool = True,
        res_rescale: float = 2.0,
        clip_input: bool = True,
        use_rrdb: bool = True,
        fix_rrdb: bool = True,
        aux_l1_loss: bool = True,
        aux_ssim_loss: bool = False,
        aux_percep_loss: bool = False,
        percep_loss_fn: Callable | None = None,
    ):
        assert schedule is not None, "pass a Schedule from make_schedule()"
        self.denoise_fn = denoise_fn
        self.rrdb = rrdb_net
        self.schedule = schedule
        self.num_timesteps = schedule.num_timesteps
        self.loss_type = loss_type
        self.res = res
        self.res_rescale = res_rescale
        self.clip_input = clip_input
        self.use_rrdb = use_rrdb and rrdb_net is not None
        self.fix_rrdb = fix_rrdb
        self.aux_l1_loss = aux_l1_loss
        self.aux_ssim_loss = aux_ssim_loss
        self.aux_percep_loss = aux_percep_loss
        self.percep_loss_fn = percep_loss_fn

    # ---------------------------------------------------------------- params
    def _apply_denoise(self, params, x, t, cond, img_lr_up, cond_projected=False):
        # cond_projected=True here always comes from a _project_cond hoist
        # that was given img_lr_up (sample_prepare/interpolate), so the
        # up-projection term is folded into cond — acknowledge explicitly
        # (the UNet errors on ambiguous combinations instead of dropping it).
        return self.denoise_fn.apply(
            {"params": params["denoise_fn"]}, x, t, cond, img_lr_up,
            cond_projected=cond_projected, up_folded=cond_projected,
        )

    def _project_cond(self, params, cond, img_lr_up=None):
        """Hoist the UNet's condition projection out of the sampling scan —
        it depends on neither x nor t, so computing it per step (as the
        reference does implicitly, model.py:825) wastes T-1 transposed convs.
        When ``img_lr_up`` is given, the scan-invariant up-projection conv is
        folded into the returned tensor too (the sum is added at the same
        point in the UNet, so this is pure reassociation)."""
        return self.denoise_fn.apply(
            {"params": params["denoise_fn"]}, None, None, cond, img_lr_up,
            project_only=True,
        )

    def _apply_encode(self, params, x, t, cond, img_lr_up):
        """UNet down path only → (skips, bottleneck). cond must be projected."""
        return self.denoise_fn.apply(
            {"params": params["denoise_fn"]}, x, t, cond, img_lr_up,
            cond_projected=True, up_folded=True, mode="encode",
        )

    def _apply_decode(self, params, enc, t, pad_out=False):
        """UNet mid/up/final from cached encoder features."""
        return self.denoise_fn.apply(
            {"params": params["denoise_fn"]}, None, t, None, None,
            mode="decode", enc_feats=enc, pad_out=pad_out,
        )

    def rrdb_cond(self, params, img_lr, img_lr_up):
        """Run the condition encoder once. Returns (rrdb_out, cond)."""
        if not self.use_rrdb:
            return img_lr_up, img_lr
        rrdb_params = params["rrdb"]
        if self.fix_rrdb:
            rrdb_params = jax.lax.stop_gradient(rrdb_params)
        out, feas = self.rrdb.apply({"params": rrdb_params}, img_lr, True)
        cond = jnp.concatenate(feas[2::3], axis=-1)
        if self.fix_rrdb:
            out = jax.lax.stop_gradient(out)
            cond = jax.lax.stop_gradient(cond)
        return out, cond

    # ------------------------------------------------------------- q process
    def q_mean_variance(self, x_start, t):
        s = self.schedule
        nd = x_start.ndim
        mean = extract(s.sqrt_alphas_cumprod, t, nd) * x_start
        variance = extract(1.0 - s.alphas_cumprod, t, nd)
        log_variance = extract(s.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Draw x_t ~ q(x_t | x_0); t may be −1, returning x_start."""
        s = self.schedule
        nd = x_start.ndim
        t_cond = (t >= 0).astype(x_start.dtype).reshape(t.shape[0], *((1,) * (nd - 1)))
        tc = jnp.maximum(t, 0)
        x_t = (
            extract(s.sqrt_alphas_cumprod, tc, nd) * x_start
            + extract(s.sqrt_one_minus_alphas_cumprod, tc, nd) * noise
        )
        return x_t * t_cond + x_start * (1.0 - t_cond)

    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        nd = x_t.ndim
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def q_posterior(self, x_start, x_t, t):
        s = self.schedule
        nd = x_t.ndim
        mean = (
            extract(s.posterior_mean_coef1, t, nd) * x_start
            + extract(s.posterior_mean_coef2, t, nd) * x_t
        )
        variance = extract(s.posterior_variance, t, nd)
        log_variance = extract(s.posterior_log_variance_clipped, t, nd)
        return mean, variance, log_variance

    def p_mean_variance(self, x, t, noise_pred, clip_denoised: bool = True):
        x_recon = self.predict_start_from_noise(x, t, noise_pred)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean, variance, log_variance = self.q_posterior(x_recon, x, t)
        return mean, variance, log_variance, x_recon

    # -------------------------------------------------------------- training
    def p_losses(self, params, x_start, t, cond, img_lr_up, rng):
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        x_tp1_gt = self.q_sample(x_start, t, noise)
        x_t_gt = self.q_sample(x_start, t - 1, noise)
        noise_pred = self._apply_denoise(params, x_tp1_gt, t, cond, img_lr_up)
        noise_pred = noise_pred.astype(jnp.float32)
        # one posterior step, for visualisation only (no grad)
        x_t_pred, x0_pred = self.p_sample_from_pred(
            jax.lax.stop_gradient(x_tp1_gt), t,
            jax.lax.stop_gradient(noise_pred),
            jax.random.fold_in(rng, 1),
        )

        if self.loss_type == "l1":
            loss = jnp.abs(noise - noise_pred).mean()
        elif self.loss_type == "l2":
            loss = jnp.mean((noise - noise_pred) ** 2)
        elif self.loss_type == "ssim":
            loss = jnp.abs(noise - noise_pred).mean()
            loss = loss + (1.0 - ssim_loss(noise, noise_pred))
        else:
            raise NotImplementedError(self.loss_type)
        return loss, x_tp1_gt, noise_pred, x_t_pred, x_t_gt, x0_pred

    def training_losses(self, params, img_hr, img_lr, img_lr_up, rng, t=None):
        """Full training forward (reference ``forward``, ``model.py:992-1021``).

        Returns ``(losses: dict, (x_tp1, x_t_gt, x_t): viz images, t)``.
        """
        b = img_hr.shape[0]
        rng_t, rng_p = jax.random.split(rng)
        if t is None:
            t = jax.random.randint(rng_t, (b,), 0, self.num_timesteps)
        else:
            t = jnp.full((b,), t, jnp.int32)
        rrdb_out, cond = self.rrdb_cond(params, img_lr, img_lr_up)
        x = self.img2res(img_hr, img_lr_up)
        loss, x_tp1, _, x_t, x_t_gt, _ = self.p_losses(params, x, t, cond, img_lr_up, rng_p)
        losses = {"q": loss}
        if self.use_rrdb and not self.fix_rrdb:
            if self.aux_l1_loss:
                losses["aux_l1"] = jnp.abs(rrdb_out - img_hr).mean()
            if self.aux_ssim_loss:
                losses["aux_ssim"] = 1.0 - ssim_loss(rrdb_out, img_hr)
            if self.aux_percep_loss and self.percep_loss_fn is not None:
                losses["aux_percep"] = self.percep_loss_fn(img_hr, rrdb_out)
        imgs = tuple(self.res2img(v, img_lr_up) for v in (x_tp1, x_t_gt, x_t))
        return losses, imgs, t

    # -------------------------------------------------------------- sampling
    def p_sample_from_pred(self, x, t, noise_pred, rng, clip_denoised: bool = True,
                           noise_c: int | None = None, noise_shape=None):
        mean, _, log_variance, x0 = self.p_mean_variance(x, t, noise_pred, clip_denoised)
        noise = _lane_noise(rng, noise_shape or x.shape, noise_c, x.dtype,
                            out_shape=x.shape if noise_shape else None)
        nonzero = (t > 0).astype(x.dtype).reshape(x.shape[0], *((1,) * (x.ndim - 1)))
        return mean + nonzero * jnp.exp(0.5 * log_variance) * noise, x0

    def p_sample(self, params, x, t, cond, img_lr_up, rng, noise_pred=None,
                 clip_denoised=True, cond_projected=False, noise_c=None):
        if noise_pred is None:
            noise_pred = self._apply_denoise(
                params, x, t, cond, img_lr_up, cond_projected
            ).astype(jnp.float32)
        return self.p_sample_from_pred(x, t, noise_pred, rng, clip_denoised, noise_c)

    def sample_prepare(self, params, img_lr, img_lr_up, rng, shape=None):
        """Everything before the sampler scan: RRDB condition (computed once,
        reference ``model.py:1072``), cond projection, and the initial state.
        Returns ``(x, cond, rrdb_out, rng_steps)`` — shared by the one-scan
        samplers and the segmented progress path."""
        shape = tuple(shape) if shape is not None else img_lr_up.shape
        b = shape[0]
        with jax.named_scope("rrdb_cond"):
            rrdb_out, cond = self.rrdb_cond(params, img_lr, img_lr_up)
            cond = self._project_cond(params, cond, img_lr_up)
        rng_init, rng_steps = jax.random.split(rng)
        if self.res:
            x = jax.random.normal(rng_init, shape, jnp.float32)
        else:
            # non-res regime: start from the noised LR-upsample
            # (reference model.py:1070-1074)
            t0 = jnp.full((b,), self.num_timesteps - 1, jnp.int32)
            x = self.q_sample(img_lr_up, t0, jax.random.normal(rng_init, shape, jnp.float32))
        # lane-pad the carry (see pad_carry_lanes) — lane 3 stays exactly 0
        x = _lane_pad(x, pad_carry_lanes())
        return x, cond, rrdb_out, rng_steps

    def sample_segment(self, params, x, cond, img_lr_up, ts, rng_steps):
        """Ancestral scan over an arbitrary (descending) timestep slice.
        Per-step noise is keyed by ``fold_in(rng_steps, t)``, so any
        segmentation of the schedule reproduces the single-scan result."""
        b = x.shape[0]
        nc = self._true_c(x, img_lr_up)
        s4 = x.shape
        flat = flat_carry() and x.ndim == 4
        if flat:
            x = x.reshape(b, s4[1], s4[2] * s4[3])

        def step(x, ti):
            t = jnp.full((b,), ti, jnp.int32)
            x4 = x.reshape(s4) if flat else x
            eps = self._apply_denoise(
                params, x4, t, cond, img_lr_up, True
            ).astype(jnp.float32)
            x_next, _ = self.p_sample_from_pred(
                x, t, eps.reshape(x.shape), jax.random.fold_in(rng_steps, ti),
                noise_c=nc, noise_shape=s4 if flat else None,
            )
            return x_next, None

        with jax.named_scope("sampler_scan"):
            x, _ = jax.lax.scan(step, x, ts)
        return x.reshape(s4) if flat else x

    def sample(self, params, img_lr, img_lr_up, rng, shape=None, save_intermediate=False):
        """Ancestral sampling, one ``lax.scan`` over all T steps.

        Returns ``(img, rrdb_out)`` (plus stacked intermediates when
        ``save_intermediate``), matching reference ``sample()``
        (``model.py:1062-1091``) but fully on-device.
        """
        x, cond, rrdb_out, rng_steps = self.sample_prepare(
            params, img_lr, img_lr_up, rng, shape
        )
        b = x.shape[0]
        nc = self._true_c(x, img_lr_up)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        if not save_intermediate:
            x = self.sample_segment(params, x, cond, img_lr_up, ts, rng_steps)
            return self.res2img(x[..., :nc], img_lr_up), rrdb_out

        def step(x, ti):
            t = jnp.full((b,), ti, jnp.int32)
            x_next, x0 = self.p_sample(
                params, x, t, cond, img_lr_up, jax.random.fold_in(rng_steps, ti),
                cond_projected=True, noise_c=nc,
            )
            return x_next, (
                self.res2img(x_next[..., :nc], img_lr_up),
                self.res2img(x0[..., :nc], img_lr_up),
            )

        with jax.named_scope("sampler_scan"):
            x, intermediates = jax.lax.scan(step, x, ts)
        return self.res2img(x[..., :nc], img_lr_up), rrdb_out, intermediates

    def ddim_timesteps(self, num_steps=None):
        """The strided (descending) DDIM schedule and its successor array
        (−1 terminates) — shared by the one-scan and segmented paths."""
        T = self.num_timesteps
        num_steps = num_steps or T
        ts = jnp.linspace(0, T - 1, num_steps).round().astype(jnp.int32)[::-1]
        ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
        return ts, ts_prev

    @staticmethod
    def _true_c(x, img_lr_up):
        """The true channel count of a possibly lane-padded carry."""
        return img_lr_up.shape[-1] if img_lr_up is not None else x.shape[-1]

    def _ddim_update(self, x, ti, tp, eps, eta, rng_steps, noise_c=None,
                     noise_shape=None):
        """One DDIM x_t → x_prev update from a predicted ε (x0-clipped)."""
        acp = self.schedule.alphas_cumprod
        a_t = acp[ti]
        a_prev = jnp.where(tp >= 0, acp[jnp.maximum(tp, 0)], 1.0)
        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        x0 = jnp.clip(x0, -1.0, 1.0)
        # recompute eps from the clipped x0 for consistency
        eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)
        sigma = (
            eta
            * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t))
            * jnp.sqrt(1.0 - a_t / a_prev)
        )
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
        noise = _lane_noise(jax.random.fold_in(rng_steps, ti), noise_shape or x.shape,
                            noise_c, x.dtype, out_shape=x.shape if noise_shape else None)
        return jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise

    def ddim_segment(self, params, x, cond, img_lr_up, ts, ts_prev, rng_steps, eta=0.0):
        """DDIM scan over an arbitrary slice of the strided schedule. η=1 over
        the full subsequence is the respaced ancestral chain (σ² = respaced
        posterior variance; pinned exactly at full T by
        ``tests/test_diffusion.py``); per-step noise keys are
        ``fold_in(rng_steps, t)``, so segmentation is result-invariant."""
        b = x.shape[0]
        nc = self._true_c(x, img_lr_up)
        s4 = x.shape
        flat = flat_carry() and x.ndim == 4
        if flat:
            x = x.reshape(b, s4[1], s4[2] * s4[3])

        def step(x, t_pair):
            ti, tp = t_pair
            t = jnp.full((b,), ti, jnp.int32)
            x4 = x.reshape(s4) if flat else x
            eps = self._apply_denoise(
                params, x4, t, cond, img_lr_up, True
            ).astype(jnp.float32)
            x_next = self._ddim_update(
                x, ti, tp, eps.reshape(x.shape), eta, rng_steps, nc,
                noise_shape=s4 if flat else None,
            )
            return x_next, None

        with jax.named_scope("ddim_scan"):
            x, _ = jax.lax.scan(step, x, (ts, ts_prev))
        return x.reshape(s4) if flat else x

    def ddim_segment_encprop(
        self, params, x, cond, img_lr_up, ts, ts_prev, rng_steps, eta, enc_interval
    ):
        """DDIM with encoder propagation ("Faster Diffusion", arXiv
        2312.09608): the UNet down path (~58% of forward FLOPs) is computed
        only at every ``enc_interval``-th step and its skip features reused
        for the steps between — within a group, ε varies only through the
        time embedding in the decoder. ``len(ts)`` must be divisible by
        ``enc_interval`` (callers run the remainder exactly, per-step, at the
        low-t end where accuracy matters most)."""
        K = int(enc_interval)
        assert len(ts) % K == 0, (len(ts), K)
        b = x.shape[0]
        nc = self._true_c(x, img_lr_up)
        pad_out = x.shape[-1] > nc
        tsg = ts.reshape(-1, K)
        tspg = ts_prev.reshape(-1, K)
        s4 = x.shape
        flat = flat_carry() and x.ndim == 4
        if flat:
            x = x.reshape(b, s4[1], s4[2] * s4[3])

        def group(x, t_pair):
            tg, tpg = t_pair
            t0 = jnp.full((b,), tg[0], jnp.int32)
            x4 = x.reshape(s4) if flat else x
            enc = self._apply_encode(params, x4, t0, cond, img_lr_up)
            for j in range(K):
                t = jnp.full((b,), tg[j], jnp.int32)
                eps = self._apply_decode(params, enc, t, pad_out).astype(jnp.float32)
                x = self._ddim_update(
                    x, tg[j], tpg[j], eps.reshape(x.shape), eta, rng_steps, nc,
                    noise_shape=s4 if flat else None,
                )
            return x, None

        with jax.named_scope("ddim_encprop_scan"):
            x, _ = jax.lax.scan(group, x, (tsg, tspg))
        return x.reshape(s4) if flat else x

    def ddim_sample(self, params, img_lr, img_lr_up, rng, num_steps=None, eta=0.0,
                    shape=None, enc_interval=1):
        """DDIM sampler over a strided timestep subset (η=0 → deterministic).

        TPU-native fast path: T=100 ancestral quality at ~T/5 UNet forwards.
        ``enc_interval`` > 1 adds encoder propagation (see
        ``ddim_segment_encprop``); a non-divisible remainder at the low-t end
        runs exactly, per-step.
        """
        ts, ts_prev = self.ddim_timesteps(num_steps)
        x, cond, rrdb_out, rng_steps = self.sample_prepare(
            params, img_lr, img_lr_up, rng, shape
        )
        K = int(enc_interval) if enc_interval else 1
        if K > 1:
            n_div = (len(ts) // K) * K
            if n_div:
                x = self.ddim_segment_encprop(
                    params, x, cond, img_lr_up, ts[:n_div], ts_prev[:n_div],
                    rng_steps, eta, K,
                )
            if n_div < len(ts):
                x = self.ddim_segment(
                    params, x, cond, img_lr_up, ts[n_div:], ts_prev[n_div:],
                    rng_steps, eta,
                )
        else:
            x = self.ddim_segment(params, x, cond, img_lr_up, ts, ts_prev, rng_steps, eta)
        return self.res2img(x[..., : self._true_c(x, img_lr_up)], img_lr_up), rrdb_out

    def interpolate(self, params, x1, x2, img_lr, img_lr_up, rng, t=None, lam=0.5):
        """Latent mixing sampler (reference ``model.py:1093-1116``)."""
        b = x1.shape[0]
        t = self.num_timesteps - 1 if t is None else int(t)
        _, cond = self.rrdb_cond(params, img_lr, img_lr_up)
        cond = self._project_cond(params, cond, img_lr_up)
        x1 = self.img2res(x1, img_lr_up)
        x2 = self.img2res(x2, img_lr_up)
        tb = jnp.full((b,), t, jnp.int32)
        k1, k2, rng_steps = jax.random.split(rng, 3)
        xt1 = self.q_sample(x1, tb, jax.random.normal(k1, x1.shape, jnp.float32))
        xt2 = self.q_sample(x2, tb, jax.random.normal(k2, x2.shape, jnp.float32))
        x = (1.0 - lam) * xt1 + lam * xt2

        def step(x, ti):
            tt = jnp.full((b,), ti, jnp.int32)
            x_next, _ = self.p_sample(
                params, x, tt, cond, img_lr_up, jax.random.fold_in(rng_steps, ti),
                cond_projected=True,
            )
            return x_next, None

        x, _ = jax.lax.scan(step, x, jnp.arange(t - 1, -1, -1))
        return self.res2img(x, img_lr_up)

    # ------------------------------------------------------- residual regime
    def res2img(self, img_, img_lr_up, clip_input=None):
        clip_input = self.clip_input if clip_input is None else clip_input
        if self.res:
            if clip_input:
                img_ = jnp.clip(img_, -1.0, 1.0)
            img_ = img_ / self.res_rescale + img_lr_up
        return img_

    def img2res(self, x, img_lr_up, clip_input=None):
        clip_input = self.clip_input if clip_input is None else clip_input
        if self.res:
            x = (x - img_lr_up) * self.res_rescale
            if clip_input:
                x = jnp.clip(x, -1.0, 1.0)
        return x
