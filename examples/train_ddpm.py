"""Train the from-scratch DDPM at 32×32 and sample a grid.

Realises the reference's missing ``basic_diffusion.ipynb`` (architecture per
``basic_diffusion_model.png``): noise-prediction UNet with GroupNorm +
attention, linear schedule, ancestral sampling compiled as one lax.scan.

    python examples/train_ddpm.py --steps 2000
"""

from __future__ import annotations

import sys

import jax
import numpy as np

sys.path.insert(0, "examples")
from common import base_parser, batches, get_mnist, save_grid

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.train.tasks.vae import DDPMTask


def main() -> None:
    parser = base_parser("basic_diffusion DDPM training")
    parser.add_argument("--timesteps", type=int, default=1000)
    parser.add_argument("--dim", type=int, default=64)
    args = parser.parse_args()

    x = get_mnist(args, size=32)
    hp = Hparams(
        lr=2e-4, val_check_interval=0, tb_log_interval=100, seed=args.seed,
        ddpm_timesteps=args.timesteps, ddpm_dim=args.dim,
    )
    task = DDPMTask(hp, img_hw=32)
    trainer = task.make_trainer()
    trainer.work_dir = args.out_dir
    data = ({"x": b} for b in batches(x, args.batch_size, args.seed))
    state = trainer.fit(data, jax.random.PRNGKey(args.seed), max_updates=args.steps, resume=False)

    samples = task.sample(jax.device_get(state.params), jax.random.PRNGKey(1), n=16)
    save_grid(np.asarray(samples), f"{args.out_dir}/ddpm_samples.png", cols=4)


if __name__ == "__main__":
    main()
