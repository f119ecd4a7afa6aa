"""Train the adversarial models: simple MLP GAN, DCGAN, or WGAN-GP.

TPU realisation of the reference training loops
(``notebooks/simple_gan.ipynb`` cell 22, ``dcgan.ipynb`` cell 17,
``wgan-gp.ipynb`` cells 34-39): same losses, same 5:1 critic schedule and
λ=10 gradient penalty for WGAN-GP, one jitted step per adversarial round.

    python examples/train_gan.py --kind dcgan --steps 1000
"""

from __future__ import annotations

import sys

import jax

sys.path.insert(0, "examples")
from common import base_parser, batches, get_mnist, save_grid

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.train.tasks.gan import GANTask
from dgm_img_super_resolution_tpu.utils import StepTimer


def main() -> None:
    parser = base_parser("GAN / DCGAN / WGAN-GP training")
    parser.add_argument("--kind", choices=["gan", "dcgan", "wgan-gp"], default="dcgan")
    args = parser.parse_args()

    size = 28  # all reference notebooks train on native-resolution MNIST
    x = get_mnist(args, size=size)
    hp = Hparams(seed=args.seed)
    task = GANTask(hp, kind=args.kind, img_shape=(size, size, 1))
    state = task.init_state(jax.random.PRNGKey(args.seed))
    step_fn = task.jitted_step()

    timer = StepTimer()
    data = batches(x, args.batch_size, args.seed)
    for i in range(args.steps):
        state, metrics = step_fn(state, next(data), jax.random.PRNGKey(args.seed * 100003 + i))
        timer.tick()
        if (i + 1) % 100 == 0:
            scal = {k: round(float(v), 4) for k, v in metrics.items()}
            print(f"| step {i + 1} {scal} ({timer.steps_per_sec:.1f} it/s)")
            fake = task.generate(state, jax.random.PRNGKey(7), 16)
            save_grid(fake, f"{args.out_dir}/{args.kind}_samples_{i + 1}.png", cols=4)


if __name__ == "__main__":
    main()
