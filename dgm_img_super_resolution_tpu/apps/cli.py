"""Command-line interface: infer / train / eval / bench subcommands.

The CLI surface the reference drives through argparse-in-``set_hparams``
(``model.py:291-303``: ``--config/--exp_name/-hp/--infer/--validate``) plus
explicit subcommands.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Honour an explicitly set JAX_PLATFORMS even when a site config pins the
# platform list (e.g. this build image pins "axon,cpu", which overrides the
# env var and makes JAX_PLATFORMS=cpu hang on a dead TPU tunnel).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


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
    elif getattr(args, "progress", False):
        # sampler progress on stderr (the reference's sample_tqdm surface,
        # model.py:1076-1078) — segments of 10 keep device dispatches large
        import sys

        def _bar(done, total):
            n = int(30 * done / total)
            sys.stderr.write(f"\r| sampling [{'#' * n}{'.' * (30 - n)}] {done}/{total}")
            sys.stderr.flush()
            if done == total:
                sys.stderr.write("\n")

        sr = pipe.upscale(img, progress_cb=_bar, callback_steps=10)
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
    from dgm_img_super_resolution_tpu.parallel.mesh import init_distributed
    from dgm_img_super_resolution_tpu.train.tasks.srdiff import SRDiffTask

    init_distributed()  # no-op single-host; joins the slice when env vars say so
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


def cmd_test(args) -> int:
    """Directory evaluation: SR every image in ``test_input_dir``-style dir,
    save PNGs into the gen dir, aggregate PSNR/SSIM/lr_psnr — the workflow the
    reference's ``test_input_dir``/``gen_dir_name``/``test_save_png`` config
    keys describe (``srdiff/config.yaml:65,67,66``)."""
    import os

    import numpy as np
    from PIL import Image

    from dgm_img_super_resolution_tpu.core.config import set_hparams
    from dgm_img_super_resolution_tpu.inference import SRDiffPipeline
    from dgm_img_super_resolution_tpu.metrics import Measure
    from dgm_img_super_resolution_tpu.ops.resize import imresize

    hp = set_hparams(args.config, args.exp_name, args.hparams)
    input_dir = args.input_dir or hp.get("test_input_dir", "")
    if not input_dir:
        print("no input dir (pass INPUT_DIR or set test_input_dir)", file=sys.stderr)
        return 2
    gen_dir = args.gen_dir or os.path.join(
        hp["work_dir"], hp.get("gen_dir_name", "") or "generated"
    )
    save_png = hp.get("test_save_png", True) and not args.no_png
    os.makedirs(gen_dir, exist_ok=True)
    pipe = SRDiffPipeline(hp, ckpt_path=args.ckpt or None)
    measure = Measure()
    scale = hp["sr_scale"]
    names = sorted(
        f for f in os.listdir(input_dir) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    agg: dict[str, list] = {}
    pairs = []
    for name in names:
        hr = np.asarray(Image.open(os.path.join(input_dir, name)).convert("RGB"))
        hr = hr[: hr.shape[0] // scale * scale, : hr.shape[1] // scale * scale]
        lr = imresize(hr, scale=1.0 / scale)
        sr = pipe.upscale(lr) if not args.patch else pipe.upscale_large(lr, patch=args.patch)
        sr_u8 = (np.clip(sr, 0, 1) * 255).round().astype(np.uint8)
        if save_png:
            Image.fromarray(sr_u8).save(os.path.join(gen_dir, name))
        res = measure.measure(sr_u8, hr, lr, scale)
        for k, v in res.items():
            agg.setdefault(k, []).append(float(v))
        if len(pairs) < args.op_point_images:
            pairs.append((lr, hr))
        print(f"| {name}: " + json.dumps({k: round(float(v), 4) for k, v in res.items()}))
    if agg:
        print(json.dumps({k: round(float(np.mean(v)), 4) for k, v in agg.items()}))
    if args.check_op_point and pairs:
        # re-validate the recorded fast-sampler operating point under the
        # weights actually loaded (critical with an imported real checkpoint:
        # the recorded point was measured under different weight regimes)
        from dgm_img_super_resolution_tpu.validation import validate_operating_point

        res = validate_operating_point(hp, pipe.params, pairs)
        print("| op-point check: " + json.dumps(res))
        with open(os.path.join(gen_dir, "op_point_check.json"), "w") as f:
            json.dump(res, f, indent=2)
        if not res["within_tol"]:
            print(
                "| WARNING: operating point drifted beyond tolerance under these "
                "weights — re-run tools/ddim_operating_point.py to re-record",
                file=sys.stderr,
            )
    return 0


def cmd_interp(args) -> int:
    """Latent interpolation between two images (``style_interp``,
    reference ``model.py:1093-1116`` / ``config.yaml:66``)."""
    import numpy as np
    from PIL import Image

    from dgm_img_super_resolution_tpu.core.config import set_hparams
    from dgm_img_super_resolution_tpu.inference import SRDiffPipeline

    hp = set_hparams(args.config, args.exp_name, args.hparams)
    pipe = SRDiffPipeline(hp, ckpt_path=args.ckpt or None)
    a = np.asarray(Image.open(args.img1).convert("RGB"))
    b = np.asarray(Image.open(args.img2).convert("RGB"))
    out = pipe.interpolate(a, b, lam=args.lam)
    out_u8 = (np.clip(out, 0, 1) * 255).round().astype(np.uint8)
    Image.fromarray(out_u8).save(args.output)
    print(f"| wrote {args.output} (lam={args.lam})")
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
    p.add_argument("--progress", action="store_true", help="show sampler progress on stderr")
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

    p = sub.add_parser("test", help="evaluate a directory of HR images (SR + metrics + PNGs)")
    _add_common(p)
    p.add_argument("input_dir", nargs="?", default="")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--gen_dir", type=str, default="")
    p.add_argument("--no_png", action="store_true")
    p.add_argument("--patch", type=int, default=0)
    p.add_argument(
        "--check-op-point", dest="check_op_point", action="store_true",
        help="re-validate the recorded DDIM operating point (ancestral chain "
        "vs fast sampler PSNR) under the loaded weights — run this whenever "
        "a real checkpoint is imported",
    )
    p.add_argument("--op-point-images", dest="op_point_images", type=int, default=2,
                   help="images used for the op-point check (first N of the dir)")
    p.set_defaults(fn=cmd_test)

    p = sub.add_parser("interp", help="latent interpolation between two images")
    _add_common(p)
    p.add_argument("img1")
    p.add_argument("img2")
    p.add_argument("output")
    p.add_argument("--lam", type=float, default=0.5)
    p.add_argument("--ckpt", type=str, default="")
    p.set_defaults(fn=cmd_interp)

    p = sub.add_parser("bench", help="run the benchmark")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
