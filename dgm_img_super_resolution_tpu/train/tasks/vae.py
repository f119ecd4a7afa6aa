"""AE / VAE training tasks (MNIST, ELBO/recon loss).

The AE mirrors ``notebooks/simple_autoencoder.ipynb`` (recon loss only; the
notebook has no training loop — the loop the README promises is implemented
here). The VAE fills the empty ``notebooks/vae.ipynb`` stub with the standard
ELBO: Bernoulli recon log-likelihood + KL(q(z|x) ‖ N(0,I)).

Inputs are [0, 1] floats (sigmoid decoders).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.models.autoencoder import VAE, AutoEncoder
from dgm_img_super_resolution_tpu.train.trainer import Trainer


class AETask:
    def __init__(self, hp: Hparams, img_hw: int = 32, img_ch: int = 1, latent_dim: int = 2):
        self.hp = hp
        self.model = AutoEncoder(latent_dim=latent_dim, out_hw=img_hw, out_ch=img_ch)
        self.img_hw, self.img_ch = img_hw, img_ch

    def init_params(self, rng):
        x = jnp.zeros((1, self.img_hw, self.img_hw, self.img_ch))
        return self.model.init(rng, x)["params"]

    def loss_fn(self, params, batch, rng):
        x = batch["x"]
        recon = self.model.apply({"params": params}, x)
        loss = jnp.mean((recon - x) ** 2)
        return loss, {"recon_mse": loss}

    def make_trainer(self, mesh=None) -> Trainer:
        return Trainer(self.hp, self.loss_fn, self.init_params, mesh=mesh)


class VAETask:
    def __init__(
        self,
        hp: Hparams,
        img_hw: int = 32,
        img_ch: int = 1,
        latent_dim: int = 16,
        beta: float = 1.0,
    ):
        self.hp = hp
        self.model = VAE(latent_dim=latent_dim, out_hw=img_hw, out_ch=img_ch)
        self.img_hw, self.img_ch = img_hw, img_ch
        self.beta = beta

    def init_params(self, rng):
        k1, k2 = jax.random.split(rng)
        x = jnp.zeros((1, self.img_hw, self.img_hw, self.img_ch))
        return self.model.init(k1, x, k2)["params"]

    def loss_fn(self, params, batch, rng):
        x = batch["x"]
        recon, mu, logvar = self.model.apply({"params": params}, x, rng)
        eps = 1e-6
        bce = -(x * jnp.log(recon + eps) + (1 - x) * jnp.log(1 - recon + eps))
        recon_nll = jnp.sum(bce, axis=(1, 2, 3)).mean()
        kl = 0.5 * jnp.sum(jnp.exp(logvar) + mu**2 - 1.0 - logvar, axis=-1).mean()
        elbo_loss = recon_nll + self.beta * kl
        return elbo_loss, {"recon_nll": recon_nll, "kl": kl}

    def sample(self, params, rng, n: int = 16) -> jnp.ndarray:
        z = jax.random.normal(rng, (n, self.model.latent_dim))
        return self.model.apply({"params": params}, z, method=self.model.decode)

    def make_trainer(self, mesh=None) -> Trainer:
        return Trainer(self.hp, self.loss_fn, self.init_params, mesh=mesh)


class DDPMTask:
    """From-scratch DDPM at 32×32 (train + ancestral sampling)."""

    def __init__(self, hp: Hparams, img_hw: int = 32, img_ch: int = 1):
        from dgm_img_super_resolution_tpu.diffusion.ddpm import DDPM
        from dgm_img_super_resolution_tpu.diffusion.schedule import make_schedule
        from dgm_img_super_resolution_tpu.models.ddpm_unet import DDPMUnet

        self.hp = hp
        self.img_hw, self.img_ch = img_hw, img_ch
        model = DDPMUnet(
            dim=int(hp.get("ddpm_dim", 64)),
            out_dim=img_ch,
            dim_mults=(1, 2, 4),
        )
        schedule = make_schedule(
            timesteps=int(hp.get("ddpm_timesteps", 1000)),
            beta_schedule="linear",
            beta_start=1e-4,
            beta_end=2e-2,
            res=False,
        )
        self.ddpm = DDPM(model, schedule)

    def init_params(self, rng):
        x = jnp.zeros((1, self.img_hw, self.img_hw, self.img_ch))
        return self.ddpm.model.init(rng, x, jnp.zeros((1,), jnp.int32))["params"]

    def loss_fn(self, params, batch, rng):
        loss = self.ddpm.loss(params, batch["x"], rng)
        return loss, {}

    def sample(self, params, rng, n: int = 16) -> jnp.ndarray:
        return self.ddpm.sample(params, (n, self.img_hw, self.img_hw, self.img_ch), rng)

    def make_trainer(self, mesh=None) -> Trainer:
        return Trainer(self.hp, self.loss_fn, self.init_params, mesh=mesh)
