"""dgm_img_super_resolution_tpu — a TPU-native (JAX/XLA/Pallas/pjit) generative
super-resolution framework.

Re-designed from scratch for TPU with the capabilities of the reference repo
``aryaman1802/dgm_img_super_resolution`` (PyTorch):

- SRDiff conditional residual diffusion SR (RRDB encoder + conditional UNet,
  100-step ancestral sampler compiled as a single jitted ``lax.scan``).
- Stable-Diffusion x4-upscaler pipeline (text-conditioned cross-attention UNet,
  VAE decode, DDPM/DDIM schedulers) built natively in Flax + Pallas kernels.
- Educational generative models (AE, VAE, GAN, DCGAN, WGAN-GP, DDPM) on a
  unified TPU trainer.
- Metrics (PSNR/SSIM/LPIPS/lr_psnr), MATLAB-exact bicubic resize expressed as
  MXU matmuls, Orbax checkpointing with a PyTorch-checkpoint importer.

Layout is NHWC throughout (TPU conv-native); parallelism is expressed with
``jax.sharding.Mesh`` + ``shard_map`` (data-parallel batches, spatial patch
parallelism), never with per-host loops.
"""

__version__ = "0.1.0"

from dgm_img_super_resolution_tpu.core.config import Hparams, set_hparams  # noqa: F401
