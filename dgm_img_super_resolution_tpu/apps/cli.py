"""Command-line interface: infer / train / eval / bench subcommands.

The CLI surface the reference drives through argparse-in-``set_hparams``
(``model.py:291-303``: ``--config/--exp_name/-hp/--infer/--validate``) plus
explicit subcommands.
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", type=str, default="", help="YAML config path")
    p.add_argument("--exp_name", type=str, default="", help="experiment name")
    p.add_argument("-hp", "--hparams", type=str, default="", help="dotted overrides, e.g. lr=1e-4,res=false")


def cmd_infer(args) -> int:
    import numpy as np
    from PIL import Image

    from dgm_img_super_resolution_tpu.core.config import set_hparams
    from dgm_img_super_resolution_tpu.inference import SRDiffPipeline

    hp = set_hparams(args.config, args.exp_name, args.hparams)
    pipe = SRDiffPipeline(hp, ckpt_path=args.ckpt or None)
    img = np.asarray(Image.open(args.input).convert("RGB"))
    if args.patch:
        sr = pipe.upscale_large(img, patch=args.patch)
    else:
        sr = pipe.upscale(img)
    out = (np.clip(sr, 0, 1) * 255).round().astype(np.uint8)
    Image.fromarray(out).save(args.output)
    print(f"| wrote {args.output} ({out.shape[1]}x{out.shape[0]})")
    return 0


def cmd_train(args) -> int:
    import jax

    from dgm_img_super_resolution_tpu.core.config import set_hparams
    from dgm_img_super_resolution_tpu.data.div2k import DIV2KDataset
    from dgm_img_super_resolution_tpu.data.loader import DataLoader
    from dgm_img_super_resolution_tpu.train.tasks.srdiff import SRDiffTask

    hp = set_hparams(args.config, args.exp_name, args.hparams)
    ds = DIV2KDataset(
        args.data_dir,
        scale_factor=hp["sr_scale"],
        hr_height=hp.get("patch_size", 160),
        hr_width=hp.get("patch_size", 160),
        data_augmentation=hp["data_augmentation"],
    )
    loader = DataLoader(
        ds, hp["batch_size"], num_workers=hp["num_workers"], endless=True, seed=hp["seed"]
    )
    task = SRDiffTask(hp)
    trainer = task.make_trainer()
    trainer.fit(iter(loader), jax.random.PRNGKey(hp["seed"]), max_updates=args.max_updates or None)
    return 0


def cmd_eval(args) -> int:
    import numpy as np
    from PIL import Image

    from dgm_img_super_resolution_tpu.core.config import set_hparams
    from dgm_img_super_resolution_tpu.inference import SRDiffPipeline
    from dgm_img_super_resolution_tpu.metrics import Measure
    from dgm_img_super_resolution_tpu.ops.resize import imresize

    hp = set_hparams(args.config, args.exp_name, args.hparams)
    pipe = SRDiffPipeline(hp, ckpt_path=args.ckpt or None)
    measure = Measure()
    hr = np.asarray(Image.open(args.input).convert("RGB"))
    scale = hp["sr_scale"]
    hr = hr[: hr.shape[0] // scale * scale, : hr.shape[1] // scale * scale]
    lr = imresize(hr, scale=1.0 / scale)
    sr = pipe.upscale(lr)
    sr_u8 = (np.clip(sr, 0, 1) * 255).round().astype(np.uint8)
    res = measure.measure(sr_u8, hr, lr, scale)
    print(json.dumps({k: round(float(v), 4) for k, v in res.items()}))
    return 0


def cmd_bench(args) -> int:
    import runpy

    runpy.run_module("bench", run_name="__main__")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="dgmsr", description="TPU-native SR framework")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("infer", help="super-resolve an image")
    _add_common(p)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--patch", type=int, default=0, help="patch size for tiled large-image SR")
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("train", help="train SRDiff on DIV2K-style data")
    _add_common(p)
    p.add_argument("data_dir")
    p.add_argument("--max_updates", type=int, default=0)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="PSNR/SSIM/lr_psnr on an HR image")
    _add_common(p)
    p.add_argument("input")
    p.add_argument("--ckpt", type=str, default="")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("bench", help="run the benchmark")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
