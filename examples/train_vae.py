"""Train the simple autoencoder or the VAE (MNIST, ELBO/recon loss).

The AE mirrors ``notebooks/simple_autoencoder.ipynb`` (plus the training loop
the notebook omits); the VAE fills the reference's empty ``vae.ipynb`` stub.

    python examples/train_vae.py --model vae --steps 1000
"""

from __future__ import annotations

import sys

import jax
import numpy as np

sys.path.insert(0, "examples")
from common import base_parser, batches, get_mnist, save_grid

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.train.tasks.vae import AETask, VAETask


def main() -> None:
    parser = base_parser("AE / VAE training")
    parser.add_argument("--model", choices=["ae", "vae"], default="vae")
    parser.add_argument("--latent_dim", type=int, default=16)
    args = parser.parse_args()

    x = (get_mnist(args, size=32) + 1.0) / 2.0  # sigmoid decoders want [0,1]
    hp = Hparams(lr=1e-3, val_check_interval=0, tb_log_interval=100, seed=args.seed)
    task = (
        AETask(hp, latent_dim=2)
        if args.model == "ae"
        else VAETask(hp, latent_dim=args.latent_dim)
    )
    trainer = task.make_trainer()
    trainer.work_dir = args.out_dir
    data = ({"x": b} for b in batches(x, args.batch_size, args.seed))
    state = trainer.fit(data, jax.random.PRNGKey(args.seed), max_updates=args.steps, resume=False)

    if args.model == "vae":
        samples = task.sample(jax.device_get(state.params), jax.random.PRNGKey(1), n=16)
        save_grid(np.asarray(samples), f"{args.out_dir}/vae_samples.png", cols=4)
    else:
        recon = task.model.apply({"params": jax.device_get(state.params)}, x[:16])
        save_grid(np.asarray(recon), f"{args.out_dir}/ae_recon.png", cols=4)


if __name__ == "__main__":
    main()
