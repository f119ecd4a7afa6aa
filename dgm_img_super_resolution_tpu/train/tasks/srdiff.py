"""SRDiff training task.

The trainer the reference's config describes (``trainer_cls:
tasks.srdiff_df2k.SRDiffDf2k``, reference ``srdiff/config.yaml:70`` — class
not present in the repo): diffusion loss on the residual (plus aux RRDB
losses when the encoder is trainable), driven by the generic
:class:`~..trainer.Trainer`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.diffusion.gaussian import GaussianDiffusion
from dgm_img_super_resolution_tpu.models.factory import build_srdiff, init_srdiff_params
from dgm_img_super_resolution_tpu.train.trainer import Trainer


class SRDiffTask:
    """Bundles the diffusion model with its loss/init for the Trainer.

    Batch format: ``{"hr": (N,H,W,3), "lr": (N,H/s,W/s,3), "lr_up": (N,H,W,3)}``
    all in [-1, 1] (the DIV2K pipeline produces exactly this — ``data/div2k.py``).
    """

    def __init__(self, hp: Hparams, diffusion: GaussianDiffusion | None = None):
        self.hp = hp
        self.diffusion = diffusion or build_srdiff(hp)
        # use_wn: optimise over weight-norm (v, g) pairs on the UNet and
        # materialise effective kernels inside the loss (the functional form
        # of the reference's weight_norm wrap/strip, model.py:812-818,849-856)
        self.use_wn = bool(hp.get("use_wn", False))

    def _materialize(self, params: Any) -> Any:
        if not self.use_wn:
            return params
        from dgm_img_super_resolution_tpu.models.param_transforms import wn_merge

        return {**params, "denoise_fn": wn_merge(params["denoise_fn"])}

    def loss_fn(self, params: Any, batch: dict, rng: jax.Array):
        params = self._materialize(params)
        losses, _, _ = self.diffusion.training_losses(
            params, batch["hr"], batch["lr"], batch["lr_up"], rng
        )
        total = sum(losses.values())
        metrics = {k: v for k, v in losses.items()}
        return total, metrics

    def init_params(self, rng: jax.Array):
        import os

        params = init_srdiff_params(
            self.diffusion, rng, self.hp, hr_size=self.hp.get("patch_size", 160)
        )
        rrdb_ckpt = str(self.hp.get("rrdb_ckpt", ""))
        if self.hp.get("use_rrdb", True) and rrdb_ckpt and os.path.exists(rrdb_ckpt):
            # upstream SRDiff trains the RRDB encoder separately and loads it
            # via load_ckpt (`rrdb_ckpt`, config.yaml:46)
            from dgm_img_super_resolution_tpu.ckpt.orbax_io import load_ckpt

            params["rrdb"] = load_ckpt(
                params["rrdb"], rrdb_ckpt, model_name="rrdb", strict=False
            )
        if self.use_wn:
            from dgm_img_super_resolution_tpu.models.param_transforms import wn_split

            params = {**params, "denoise_fn": wn_split(params["denoise_fn"])}
        return params

    def make_trainer(self, mesh=None) -> Trainer:
        return Trainer(
            self.hp,
            loss_fn=self.loss_fn,
            init_params_fn=self.init_params,
            mesh=mesh,
        )

    def make_val_fn(self, val_batches: list, sample_metrics: bool = False):
        """Validation closure for ``Trainer.fit`` — mean diffusion loss over
        ``valid_steps`` batches plus (optionally) sample-based PSNR/SSIM via
        ``Measure`` on the first batch (the reference's ``valid_monitor_key:
        val_loss`` + sanity-sample machinery, config.yaml:37-38,76-79)."""
        import numpy as np

        from dgm_img_super_resolution_tpu.metrics.measure import Measure
        from dgm_img_super_resolution_tpu.ops.image import pm1_to_uint8

        measure = Measure()
        n_batches = min(len(val_batches), int(self.hp.get("valid_steps", 4)))

        val_loss_fn = jax.jit(
            lambda p, b, k: self.loss_fn(p, b, k)[0]
        )
        sample_fn = jax.jit(
            lambda p, lr, lr_up, k: self.diffusion.sample(
                self._materialize(p), lr, lr_up, k
            )[0]
        )

        def val_fn(state) -> dict:
            losses = []
            for i in range(n_batches):
                losses.append(
                    float(val_loss_fn(state.params, val_batches[i], jax.random.PRNGKey(i)))
                )
            out = {"loss": float(np.mean(losses))}
            if sample_metrics:
                b = val_batches[0]
                sr = sample_fn(state.params, b["lr"], b["lr_up"], jax.random.PRNGKey(0))
                psnrs, ssims = [], []
                for j in range(min(4, sr.shape[0])):
                    res = measure.measure(
                        pm1_to_uint8(sr[j]), pm1_to_uint8(b["hr"][j]),
                        pm1_to_uint8(b["lr"][j]), self.hp["sr_scale"],
                    )
                    psnrs.append(res["psnr"])
                    ssims.append(res["ssim"])
                out["psnr"] = float(np.mean(psnrs))
                out["ssim"] = float(np.mean(ssims))
            return out

        return val_fn
