"""Stable Diffusion x4-upscaler pipeline, TPU-native.

Equivalent of the ``StableDiffusionUpscalePipeline`` the reference loads from
``diffusers`` (reference ``st_app2.py:12-27``, notebook cell 2): CLIP text
encode → noise-augment the LR image → denoising loop over latents with the
LR image channel-concatenated → VAE decode to ×4 resolution.

TPU re-design:

- the denoising loop is a single jitted ``lax.scan`` over the strided DDIM
  (or ancestral DDPM) schedule — no per-step host sync;
- classifier-free guidance runs as a doubled batch through one UNet call
  (batch dim sharded over the ``dp`` mesh axis for batched sampling);
- the per-step progress callback surface of the reference app
  (``st_app2.py:52-67``) is preserved via ``jax.debug.callback`` (host
  callback fires per scan step without blocking the device).

Scheduler semantics follow the published checkpoint's configs (vendored with
provenance in ``ckpt/sd_inventory.py``; ``load_sd_x4_pipeline`` prefers the
on-disk ``scheduler_config.json`` when a real checkout is present): the
denoiser is a **v-prediction** model on the SD latent betas with diffusers'
"leading" timestep spacing (``steps_offset=1``, ``set_alpha_to_one=False``),
while LR noise augmentation uses the separate image-space DDPM betas. The
sampler family matches the reference app's scheduler choice
(``st_app2.py:62-67``): DDIM with η (0 = deterministic) or ancestral DDPM
(implemented as the exact η=1 identity, pinned by
``tests/test_sd_pipeline.py``).

Weights: random-init by default (no network egress here); a diffusers-format
importer hook (``ckpt/sd_import.py``) maps published checkpoints when a local
file is supplied.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from dgm_img_super_resolution_tpu.diffusion.schedule import make_schedule
from dgm_img_super_resolution_tpu.models.sd.clip import CLIPTextEncoder, SimpleTokenizer
from dgm_img_super_resolution_tpu.models.sd.unet import UNet2DCondition
from dgm_img_super_resolution_tpu.models.sd.vae import AutoencoderKL


def _schedule_from_config(cfg: dict):
    """diffusers scheduler_config.json → precomputed Schedule arrays.
    diffusers "scaled_linear" is the reference's "quad" (linear in √β)."""
    name = {"scaled_linear": "quad", "squaredcos_cap_v2": "cosine"}.get(
        cfg.get("beta_schedule", "scaled_linear"), cfg.get("beta_schedule")
    )
    return make_schedule(
        timesteps=int(cfg.get("num_train_timesteps", 1000)),
        beta_schedule=name,
        beta_start=float(cfg.get("beta_start", 0.0001)),
        beta_end=float(cfg.get("beta_end", 0.02)),
        res=False,
    )


class StableDiffusionUpscalePipeline:
    def __init__(
        self,
        unet: UNet2DCondition | None = None,
        vae: AutoencoderKL | None = None,
        text_encoder: CLIPTextEncoder | None = None,
        tokenizer: SimpleTokenizer | None = None,
        params: dict | None = None,
        max_noise_level: int = 350,
        dtype=jnp.bfloat16,
        rng: jax.Array | None = None,
        tiny: bool = False,
        scheduler_config: dict | None = None,
        low_res_scheduler_config: dict | None = None,
    ):
        if tiny:  # test-sized config (compiles in seconds on CPU)
            unet = unet or UNet2DCondition(
                block_out_channels=(32, 64), attn_levels=(1,), head_dim=16,
                cross_attention_dim=64, layers_per_block=1, dtype=dtype,
            )
            vae = vae or AutoencoderKL(block_out_channels=(32, 64), layers_per_block=1, dtype=dtype)
            text_encoder = text_encoder or CLIPTextEncoder(
                vocab_size=1024, width=64, layers=2, heads=4, dtype=dtype
            )
            tokenizer = tokenizer or SimpleTokenizer(vocab_size=1024)
        if unet is None and not tiny:
            # full-size default = the published x4-upscaler architecture
            # (vendored config — ckpt/sd_inventory.py), so random-init and
            # checkpoint-import paths share one structure
            from dgm_img_super_resolution_tpu.ckpt.sd_inventory import X4_UNET_CONFIG

            unet = UNet2DCondition.from_config(X4_UNET_CONFIG, dtype=dtype)
        self.unet = unet or UNet2DCondition(dtype=dtype)
        self.vae = vae or AutoencoderKL(dtype=dtype)
        self.text_encoder = text_encoder or CLIPTextEncoder(dtype=dtype)
        self.tokenizer = tokenizer or SimpleTokenizer()
        self.max_noise_level = max_noise_level
        from dgm_img_super_resolution_tpu.ckpt.sd_inventory import (
            X4_LOW_RES_SCHEDULER_CONFIG,
            X4_SCHEDULER_CONFIG,
        )

        sc = dict(X4_SCHEDULER_CONFIG)
        sc.update(scheduler_config or {})
        lrc = dict(X4_LOW_RES_SCHEDULER_CONFIG)
        lrc.update(low_res_scheduler_config or {})
        # denoising schedule (v-prediction latent betas, published config)
        self.schedule = _schedule_from_config(sc)
        self.prediction_type = sc.get("prediction_type", "epsilon")
        self.steps_offset = int(sc.get("steps_offset", 0))
        self.final_alpha_cumprod = (
            1.0 if sc.get("set_alpha_to_one", True)
            else float(self.schedule.alphas_cumprod[0])
        )
        # separate image-space schedule for LR noise augmentation
        self.low_res_schedule = _schedule_from_config(lrc)
        self.dtype = dtype
        if params is None:
            params = self.init_params(rng if rng is not None else jax.random.PRNGKey(0))
        self.params = params

    # ------------------------------------------------------------------ init
    def init_params(self, rng: jax.Array) -> dict:
        k1, k2, k3 = jax.random.split(rng, 3)
        latent_ch = self.vae.latent_channels
        lat = jnp.zeros((1, 8, 8, latent_ch + 3), jnp.float32)
        ctx = jnp.zeros((1, self.tokenizer.max_len, self.text_encoder.width), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        unet_params = jax.jit(self.unet.init)(k1, lat, t, ctx, t)["params"]
        vae_params = jax.jit(self.vae.init)(k2, jnp.zeros((1, 32, 32, 3), jnp.float32))["params"]
        tokens = jnp.zeros((1, self.tokenizer.max_len), jnp.int32)
        text_params = jax.jit(self.text_encoder.init)(k3, tokens)["params"]
        return {"unet": unet_params, "vae": vae_params, "text_encoder": text_params}

    # ------------------------------------------------------------- internals
    @functools.partial(jax.jit, static_argnums=(0,))
    def _encode_tokens(self, params, tokens, neg_tokens):
        # One compiled program for both branches of the CFG text conditioning.
        # This MUST be jitted: eager per-op dispatch of the 12-layer encoder
        # over the tunneled device link measured 4.75 s vs 0.45 s for the
        # entire 20-step CFG UNet scan (tools/sd_decomp.py) — the unjitted
        # version dominated the pipeline's end-to-end latency ~9:1.
        cond = self.text_encoder.apply({"params": params["text_encoder"]}, tokens)
        uncond = self.text_encoder.apply({"params": params["text_encoder"]}, neg_tokens)
        return cond, uncond

    def encode_prompt(self, params, prompts: list[str], negative: list[str] | None = None):
        tokens = jnp.asarray(self.tokenizer(prompts))
        neg = negative if negative is not None else [""] * len(prompts)
        neg_tokens = jnp.asarray(self.tokenizer(neg))
        return self._encode_tokens(params, tokens, neg_tokens)

    @functools.partial(jax.jit, static_argnums=(0, 4, 5))
    def _prepare(self, params, image, rng, noise_level: int, n: int):
        """Noise-augment the LR image (the low-res DDPM schedule — distinct
        from the denoising betas) and draw the initial latents."""
        s = self.low_res_schedule
        h, w = image.shape[1:3]
        rng_lat, rng_aug = jax.random.split(rng)
        aug_noise = jax.random.normal(rng_aug, image.shape, jnp.float32)
        img_aug = (
            s.sqrt_alphas_cumprod[noise_level] * image
            + s.sqrt_one_minus_alphas_cumprod[noise_level] * aug_noise
        ).astype(self.dtype)
        x = jax.random.normal(rng_lat, (n, h, w, self.vae.latent_channels), jnp.float32)
        return x, img_aug

    @functools.partial(jax.jit, static_argnums=(0, 7, 8, 9, 11))
    def _denoise_segment(
        self,
        params,
        x,              # (N, h, w, latent_ch) current latents
        img_aug,        # (N, h, w, 3) noise-augmented LR conditioning
        ts,             # (S,) timestep indices for this segment (descending)
        ts_prev,        # (S,) predecessor timestep per step (<0 terminates)
        text_states,    # (cond, uncond) each (N, L, D)
        guidance_scale: float,
        noise_level: int,
        enc_interval: int = 1,
        rng: jax.Array | None = None,
        eta: float = 0.0,
    ):
        """One jitted ``lax.scan`` over a segment of DDIM steps. The full run
        is a single segment; with a progress callback the host splits the
        schedule into equal segments and fires the callback between device
        calls (the axon TPU backend has no host-callback support, so the
        reference's per-step callback surface maps to per-segment syncs).

        ``eta`` > 0 adds the DDIM stochastic term (σ per Song et al. eq. 16;
        η=1 over the respaced schedule ≡ the ancestral DDPM chain — the same
        identity the SRDiff side pins). Per-step noise is keyed
        ``fold_in(rng, t)``, so any segmentation reproduces the one-scan
        result exactly.

        ``enc_interval`` > 1 enables encoder propagation (arXiv 2312.09608):
        the UNet down path runs every K-th step only, its skips reused for
        the steps between (ε then varies via the time embedding and the
        decoder's cross-attention). Requires ``len(ts) % K == 0``."""
        s = self.schedule
        n = x.shape[0]
        cond, uncond = text_states
        nl = jnp.full((n,), noise_level, jnp.int32)
        acp = s.alphas_cumprod
        do_cfg = guidance_scale != 1.0
        if do_cfg:
            nl2 = jnp.concatenate([nl, nl], axis=0)
            ctx2 = jnp.concatenate([cond, uncond], axis=0).astype(self.dtype)

        def eps_at(x, t, mode="full", enc=None):
            """ε(x, t) with CFG; mode/enc select full vs cached-encoder runs."""
            if mode != "decode":
                inp = jnp.concatenate([x.astype(self.dtype), img_aug], axis=-1)
            if do_cfg:
                t2 = jnp.concatenate([t, t], axis=0)
                if mode == "encode":
                    inp2 = jnp.concatenate([inp, inp], axis=0)
                    return self.unet.apply(
                        {"params": params["unet"]}, inp2, t2, ctx2, nl2, mode="encode"
                    )
                if mode == "decode":
                    eps2 = self.unet.apply(
                        {"params": params["unet"]}, None, t2, ctx2, nl2,
                        mode="decode", enc_feats=enc,
                    )
                else:
                    inp2 = jnp.concatenate([inp, inp], axis=0)
                    eps2 = self.unet.apply(
                        {"params": params["unet"]}, inp2, t2, ctx2, nl2
                    )
                eps_c, eps_u = jnp.split(eps2.astype(jnp.float32), 2, axis=0)
                return eps_u + guidance_scale * (eps_c - eps_u)
            if mode == "encode":
                return self.unet.apply(
                    {"params": params["unet"]}, inp, t, cond.astype(self.dtype), nl,
                    mode="encode",
                )
            if mode == "decode":
                return self.unet.apply(
                    {"params": params["unet"]}, None, t, cond.astype(self.dtype), nl,
                    mode="decode", enc_feats=enc,
                ).astype(jnp.float32)
            return self.unet.apply(
                {"params": params["unet"]}, inp, t, cond.astype(self.dtype), nl
            ).astype(jnp.float32)

        def update(x, ti, tp, model_out):
            """One DDIM x_t → x_prev step from the raw model output, under the
            configured prediction type (the x4-upscaler predicts v, not ε)."""
            a_t = acp[ti]
            a_prev = jnp.where(
                tp >= 0, acp[jnp.maximum(tp, 0)], self.final_alpha_cumprod
            )
            sq_a, sq_1ma = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
            if self.prediction_type == "v_prediction":
                x0 = sq_a * x - sq_1ma * model_out
                eps = sq_a * model_out + sq_1ma * x
            elif self.prediction_type == "epsilon":
                eps = model_out
                x0 = (x - sq_1ma * eps) / sq_a
            else:
                raise NotImplementedError(self.prediction_type)
            # no x0 clipping: clip_sample=False in the published config
            if eta:
                sigma = (
                    eta
                    * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t))
                    * jnp.sqrt(1.0 - a_t / a_prev)
                )
                noise = jax.random.normal(
                    jax.random.fold_in(rng, ti), x.shape, jnp.float32
                )
            else:
                sigma, noise = 0.0, 0.0
            eps_dir = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
            return jnp.sqrt(a_prev) * x0 + eps_dir + sigma * noise

        K = int(enc_interval)
        if K > 1:
            assert len(ts) % K == 0, (len(ts), K)

            def group(x, t_pair):
                tg, tpg = t_pair
                enc = eps_at(x, jnp.full((n,), tg[0], jnp.int32), mode="encode")
                for j in range(K):
                    t = jnp.full((n,), tg[j], jnp.int32)
                    eps = eps_at(None, t, mode="decode", enc=enc)
                    x = update(x, tg[j], tpg[j], eps)
                return x, None

            x, _ = jax.lax.scan(group, x, (ts.reshape(-1, K), ts_prev.reshape(-1, K)))
            return x

        def step(x, t_pair):
            ti, tp = t_pair
            eps = eps_at(x, jnp.full((n,), ti, jnp.int32))
            return update(x, ti, tp, eps), None

        x, _ = jax.lax.scan(step, x, (ts, ts_prev))
        return x

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode(self, params, x):
        img = self.vae.apply(
            {"params": params["vae"]}, x.astype(self.dtype), method=self.vae.decode
        )
        return jnp.clip(img.astype(jnp.float32), -1.0, 1.0)

    # ------------------------------------------------------------------- API
    def __call__(
        self,
        prompt: str | list[str],
        image,
        num_inference_steps: int = 20,
        guidance_scale: float = 9.0,
        noise_level: int = 20,
        negative_prompt: str | list[str] | None = None,
        rng: jax.Array | None = None,
        callback: Callable | None = None,
        callback_steps: int = 1,
        enc_interval: int = 1,
        eta: float = 0.0,
        sampler: str = "ddim",
    ) -> np.ndarray:
        """LR image(s) (HWC/NHWC uint8 or [-1,1] float) → ×4 SR images,
        NHWC float [0,1]. The callback fires per step like the reference's
        ``pipeline(..., callback=progress_callback, callback_steps=1)``
        (``st_app2.py:62-67``). ``enc_interval`` > 1 enables encoder
        propagation (no-callback path; a non-divisible remainder at the
        low-t end runs exactly, per-step).

        ``sampler``/``eta`` mirror the diffusers scheduler choice the
        reference app exposes (``st_app2.py:62-67``): ``"ddim"`` with η
        (0 = deterministic), or ``"ddpm"`` — the ancestral chain, which on a
        respaced schedule is exactly DDIM η=1 (identity pinned in
        ``tests/test_sd_pipeline.py``, like the SRDiff side)."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        img = np.asarray(image)
        if img.ndim == 3:
            img = img[None]
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 127.5 - 1.0
        n = img.shape[0]
        if len(prompts) == 1 and n > 1:
            prompts = prompts * n
        negatives = (
            [negative_prompt] * n
            if isinstance(negative_prompt, str)
            else negative_prompt
        )
        text_states = self.encode_prompt(self.params, prompts, negatives)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng_prep, rng_steps = jax.random.split(rng)

        if sampler == "ddpm":
            # respaced ancestral chain ≡ DDIM η=1 (σ² is exactly the respaced
            # posterior variance — same identity the SRDiff sampler pins)
            eta = 1.0
        elif sampler != "ddim":
            raise ValueError(f"unknown sampler {sampler!r}")
        eta = float(eta)

        # diffusers "leading" spacing with the published steps_offset: for
        # T=1000, 20 steps → 951, 901, …, 1; predecessor = t - T//steps
        T = self.schedule.num_timesteps
        steps = int(num_inference_steps)
        ratio = T // steps
        if ratio < 1:
            raise ValueError(f"num_inference_steps {steps} > trained T {T}")
        ts = ((np.arange(steps) * ratio)[::-1] + self.steps_offset).astype(np.int32)
        ts_prev = ts - np.int32(ratio)

        x, img_aug = self._prepare(
            self.params, jnp.asarray(img, jnp.float32), rng_prep, int(noise_level), n
        )
        gs = float(guidance_scale)
        if callback is None:
            K = max(1, int(enc_interval))
            n_div = (len(ts) // K) * K if K > 1 else len(ts)
            if K > 1 and n_div:
                x = self._denoise_segment(
                    self.params, x, img_aug,
                    jnp.asarray(ts[:n_div]), jnp.asarray(ts_prev[:n_div]),
                    text_states, gs, int(noise_level), K, rng_steps, eta,
                )
            if n_div < len(ts) or K == 1:
                x = self._denoise_segment(
                    self.params, x, img_aug,
                    jnp.asarray(ts[n_div:] if K > 1 else ts),
                    jnp.asarray(ts_prev[n_div:] if K > 1 else ts_prev),
                    text_states, gs, int(noise_level), 1, rng_steps, eta,
                )
        else:
            # progress surface (reference st_app2.py:52-67): equal segments of
            # `callback_steps`, callback fired between device calls. Per-step
            # noise keys are fold_in(rng, t), so segmentation is
            # result-invariant even at η>0.
            seg = max(1, int(callback_steps))
            done = 0
            while done < steps:
                take = min(seg, steps - done)
                x = self._denoise_segment(
                    self.params, x, img_aug,
                    jnp.asarray(ts[done : done + take]),
                    jnp.asarray(ts_prev[done : done + take]),
                    text_states, gs, int(noise_level), 1, rng_steps, eta,
                )
                done += take
                callback(done - 1, int(ts[done - 1]), x)
        out = self._decode(self.params, x)
        return np.asarray(out * 0.5 + 0.5)
