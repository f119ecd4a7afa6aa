"""Model factory: Hparams → SRDiff model stack.

Mirrors how the reference wires its stack (``st_app1.py:1616-1638``: Unet +
RRDBNet from config keys → GaussianDiffusion), with the full models — the
reference app's placeholder single-conv dummies (``st_app1.py:1606-1628``)
are a documented defect we do not replicate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.diffusion.gaussian import GaussianDiffusion
from dgm_img_super_resolution_tpu.diffusion.schedule import make_schedule
from dgm_img_super_resolution_tpu.models.rrdb import RRDBNet
from dgm_img_super_resolution_tpu.models.unet import Unet

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def compute_dtype(hp: Hparams):
    return _DTYPES[hp.get("compute_dtype", "float32")]


def build_unet(hp: Hparams, dtype=None) -> Unet:
    return Unet(
        dim=hp["hidden_size"],
        out_dim=3,
        dim_mults=hp.unet_dim_mults_tuple,
        cond_dim=hp["rrdb_num_feat"],
        rrdb_num_block=hp["rrdb_num_block"],
        sr_scale=hp["sr_scale"],
        use_attn=hp["use_attn"],
        res=hp["res"],
        up_input=hp["up_input"],
        groups=hp["gn_groups"],
        dtype=dtype or compute_dtype(hp),
    )


def build_rrdb(hp: Hparams, dtype=None) -> RRDBNet:
    # gc = nf // 2 is the upstream SRDiff instantiation convention.
    return RRDBNet(
        out_nc=3,
        nf=hp["rrdb_num_feat"],
        nb=hp["rrdb_num_block"],
        gc=hp["rrdb_num_feat"] // 2,
        sr_scale=hp["sr_scale"],
        dtype=dtype or compute_dtype(hp),
    )


def build_srdiff(hp: Hparams, dtype=None) -> GaussianDiffusion:
    schedule = make_schedule(
        timesteps=hp["timesteps"],
        beta_schedule=hp["beta_schedule"],
        beta_s=hp["beta_s"],
        beta_start=hp.get("beta_start", 1e-4),
        beta_end=hp["beta_end"],
        res=hp["res"],
    )
    return GaussianDiffusion(
        denoise_fn=build_unet(hp, dtype),
        rrdb_net=build_rrdb(hp, dtype) if hp["use_rrdb"] else None,
        schedule=schedule,
        loss_type=hp["loss_type"],
        res=hp["res"],
        res_rescale=hp["res_rescale"],
        clip_input=hp["clip_input"],
        use_rrdb=hp["use_rrdb"],
        fix_rrdb=hp["fix_rrdb"],
        aux_l1_loss=hp["aux_l1_loss"],
        aux_ssim_loss=hp["aux_ssim_loss"],
        aux_percep_loss=hp["aux_percep_loss"],
    )


def init_srdiff_params(diffusion: GaussianDiffusion, rng, hp: Hparams, hr_size: int = 160):
    """Initialise {'denoise_fn': ..., 'rrdb': ...} param pytrees on tiny/real
    shapes (shapes don't matter — all layers are convs/denses)."""
    scale = hp["sr_scale"]
    lr_size = hr_size // scale
    k1, k2 = jax.random.split(rng)
    x_hr = jnp.zeros((1, hr_size, hr_size, 3), jnp.float32)
    x_lr = jnp.zeros((1, lr_size, lr_size, 3), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    params = {}
    if diffusion.use_rrdb:
        # jit the init: eager init dispatches one op per conv (very slow on a
        # tunneled TPU); under jit it's one compiled program.
        rrdb_vars = jax.jit(diffusion.rrdb.init, static_argnums=2)(k1, x_lr, True)
        params["rrdb"] = rrdb_vars["params"]
        # cond channels are static: feas has nb+1 maps of nf channels and the
        # UNet consumes feas[2::3] (reference model.py:825)
        n_sel = len(range(2, hp["rrdb_num_block"] + 1, 3))
        cond = jnp.zeros((1, lr_size, lr_size, hp["rrdb_num_feat"] * n_sel), jnp.float32)
    else:
        cond = x_lr
    unet_vars = jax.jit(diffusion.denoise_fn.init)(k2, x_hr, t, cond, x_hr)
    params["denoise_fn"] = unet_vars["params"]
    if hp.get("weight_init", False):
        # reference applies He-normal re-init to the UNet when weight_init:
        # true (model.py:809-810 → initialize_weights, model.py:78-95)
        from dgm_img_super_resolution_tpu.models.param_transforms import kaiming_init

        params["denoise_fn"] = kaiming_init(jax.random.fold_in(k2, 1), params["denoise_fn"])
    return params
