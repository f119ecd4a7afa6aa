"""Full-size end-to-end SRDiff quality-parity run: jax (TPU) vs torch twin.

VERDICT r1 missing #1: the ±0.1 dB parity claim rested on tiny-config twin
tests (hidden=8, nb=2). This tool runs the FULL production config
(hidden=64, nb=8, mults 1|2|3|4, nf=32/gc=16, T=100 cosine) end-to-end on
the reference's own test images (`/root/reference/cat_img.png`,
`car_img.png`, reference `st_app1.py:1661-1686` inference surface) at
128->512, with ONE set of weights shared through
``export_srdiff_to_torch_keys`` and ONE shared noise sequence, and records
measured PSNR/SSIM deltas.

The torch side is an independently written oracle: the tiny-config twins
from ``tests/test_torch_parity.py`` instantiated at full size, driven by a
NumPy re-derivation of the ancestral sampler math (reference
``srdiff/model.py:1050-1091``) with schedule buffers recomputed from the
published cosine formula (``model.py:898-908``) — no framework code in the
loop. The jax side is the production ``SRDiffPipeline`` running wherever
JAX's default backend points (the real TPU chip under axon).

Usage:
    python tools/parity_fullsize.py [--image cat|car|path] [--steps 100]
        [--hr-size 512] [--out PARITY_FULLSIZE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

_IMAGES = {
    "cat": "/root/reference/cat_img.png",
    "car": "/root/reference/car_img.png",
}


def _cosine_schedule_numpy(T: int, s: float = 0.008) -> dict[str, np.ndarray]:
    """Independent float64 re-derivation of the Nichol-Dhariwal cosine
    schedule + posterior buffers (reference model.py:898-908, 938-959)."""
    x = np.linspace(0, T, T + 1, dtype=np.float64)
    ac = np.cos(((x / T) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = np.clip(1.0 - ac[1:] / ac[:-1], 0.0, 0.999)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
    return {
        "sqrt_recip_acp": np.sqrt(1.0 / acp).astype(np.float32),
        "sqrt_recipm1_acp": np.sqrt(1.0 / acp - 1.0).astype(np.float32),
        "post_mean_c1": (betas * np.sqrt(acp_prev) / (1.0 - acp)).astype(np.float32),
        "post_mean_c2": ((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)).astype(np.float32),
        "post_log_var_clipped": np.log(np.maximum(post_var, 1e-20)).astype(np.float32),
    }


def _load_lr_hr(path: str, hr_size: int, scale: int) -> tuple[np.ndarray, np.ndarray]:
    from PIL import Image

    im = Image.open(path).convert("RGB").resize((hr_size, hr_size), Image.BICUBIC)
    hr = np.asarray(im, np.uint8)
    lr = np.asarray(
        im.resize((hr_size // scale, hr_size // scale), Image.BICUBIC), np.uint8
    )
    return lr, hr


def torch_reference_sample(
    torch_sd: dict, lr_u8: np.ndarray, hp, seed: int, steps: int
) -> np.ndarray:
    """Run the full SRDiff inference chain in torch/NumPy (the oracle)."""
    import jax
    import torch
    import torch.nn.functional as F
    from test_torch_parity import TRRDBNet, TUnet

    torch.set_num_threads(max(1, os.cpu_count() or 1))
    nf, nb = hp["rrdb_num_feat"], hp["rrdb_num_block"]
    scale = hp["sr_scale"]
    T = hp["timesteps"]
    assert steps == T, "torch oracle implements the full ancestral chain only"

    tunet = TUnet(
        dim=hp["hidden_size"],
        out_dim=3,
        dim_mults=hp.unet_dim_mults_tuple,
        cond_dim=nf,
        nb=nb,
        scale=scale,
    )
    trrdb = TRRDBNet(out_nc=3, nf=nf, nb=nb, gc=nf // 2, scale=scale)
    sd = {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in torch_sd.items()}
    tunet.load_state_dict(
        {k[len("denoise_fn."):]: v for k, v in sd.items() if k.startswith("denoise_fn.")},
        strict=True,
    )
    trrdb.load_state_dict(
        {k[len("rrdb."):]: v for k, v in sd.items() if k.startswith("rrdb.")}, strict=True
    )
    tunet.eval()
    trrdb.eval()

    h, w = lr_u8.shape[:2]
    H, W = h * scale, w * scale
    lr_t = torch.from_numpy((lr_u8.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1))[None]
    lr_up = F.interpolate(lr_t, size=(H, W), mode="bicubic", align_corners=True)

    # shared noise: exactly the sequence the jax sampler draws internally
    # (gaussian.py::sample — split -> init normal; per step fold_in(ti))
    key = jax.random.PRNGKey(seed)
    rng_init, rng_steps = jax.random.split(key)
    shape = (1, H, W, 3)

    def jnoise(k):
        return torch.from_numpy(
            np.asarray(jax.random.normal(k, shape, np.float32)).transpose(0, 3, 1, 2).copy()
        )

    sched = _cosine_schedule_numpy(T, hp["beta_s"])
    with torch.no_grad():
        _, feas = trrdb(lr_t)
        cond = torch.cat(feas[2::3], dim=1)
        x = jnoise(rng_init)
        for i, ti in enumerate(range(T - 1, -1, -1)):
            t0 = time.time()
            eps = tunet(x, torch.tensor([ti]), cond)
            x_recon = torch.clamp(
                sched["sqrt_recip_acp"][ti] * x - sched["sqrt_recipm1_acp"][ti] * eps,
                -1.0, 1.0,
            )
            mean = sched["post_mean_c1"][ti] * x_recon + sched["post_mean_c2"][ti] * x
            nonzero = 1.0 if ti > 0 else 0.0
            x = mean + nonzero * np.exp(0.5 * sched["post_log_var_clipped"][ti]) * jnoise(
                jax.random.fold_in(rng_steps, ti)
            )
            if i % 10 == 0:
                print(f"| torch step {i}/{T}  ({time.time() - t0:.1f}s/step)", flush=True)
        img = torch.clamp(x, -1.0, 1.0) / hp["res_rescale"] + lr_up
        out01 = torch.clamp(img * 0.5 + 0.5, 0.0, 1.0)
    return out01[0].permute(1, 2, 0).numpy()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default="cat")
    ap.add_argument("--hr-size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="PARITY_FULLSIZE.json")
    ap.add_argument("--append", action="store_true", help="merge into existing --out")
    ap.add_argument(
        "--phase", choices=["both", "jax", "torch"], default="both",
        help="'jax' runs the (fast) TPU side and saves --state; 'torch' runs "
        "the (slow, CPU-only) oracle from --state without holding the TPU",
    )
    ap.add_argument("--state", default="/tmp/parity_state.npz")
    args = ap.parse_args()

    import jax

    if args.phase == "torch":
        # the oracle phase must not grab the TPU (the site config pins
        # jax_platforms=axon,cpu, so the env var alone cannot force CPU);
        # jax is only used for noise generation here
        jax.config.update("jax_platforms", "cpu")
    # full f32 accuracy on the TPU MXU for the parity claim (default conv
    # precision uses bf16 passes)
    jax.config.update("jax_default_matmul_precision", "highest")

    from dgm_img_super_resolution_tpu.core.config import Hparams
    from dgm_img_super_resolution_tpu.metrics.measure import Measure

    hp = Hparams(compute_dtype="float32", timesteps=args.steps)
    path = _IMAGES.get(args.image, args.image)
    lr, hr = _load_lr_hr(path, args.hr_size, hp["sr_scale"])
    state = f"{args.state}.{args.image}.npz" if args.state == "/tmp/parity_state.npz" else args.state

    if args.phase in ("both", "jax"):
        from dgm_img_super_resolution_tpu.ckpt.torch_import import (
            export_srdiff_to_torch_keys,
        )
        from dgm_img_super_resolution_tpu.inference import SRDiffPipeline

        print(f"| image {path}: LR {lr.shape} -> HR {hr.shape}", flush=True)
        pipe = SRDiffPipeline(hp, rng=jax.random.PRNGKey(42))
        t0 = time.time()
        out_jax = pipe.upscale(lr, jax.random.PRNGKey(args.seed))
        print(f"| jax ({jax.default_backend()}) sample done in {time.time() - t0:.1f}s",
              flush=True)
        torch_sd = {
            k: np.asarray(v, np.float32)
            for k, v in export_srdiff_to_torch_keys(pipe.params).items()
        }
        if args.phase == "jax":
            np.savez(state, __out_jax__=np.asarray(out_jax),
                     __backend__=np.asarray(jax.default_backend()), **torch_sd)
            print(f"| wrote {state}; run --phase torch to finish")
            return
        jax_backend = jax.default_backend()
    else:
        blob = np.load(state)
        out_jax = blob["__out_jax__"]
        jax_backend = str(blob["__backend__"])
        torch_sd = {k: blob[k] for k in blob.files if not k.startswith("__")}
        print(f"| loaded {state} (jax side ran on {jax_backend})", flush=True)

    t0 = time.time()
    out_torch = torch_reference_sample(torch_sd, lr, hp, args.seed, args.steps)
    print(f"| torch oracle done in {time.time() - t0:.1f}s", flush=True)

    m = Measure()
    u8 = lambda a: np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    jax_vs_torch_psnr = m.psnr(u8(out_jax), u8(out_torch))
    jax_vs_torch_ssim = m.ssim(u8(out_jax), u8(out_torch))
    r_jax = {"psnr": m.psnr(u8(out_jax), hr), "ssim": m.ssim(u8(out_jax), hr)}
    r_torch = {"psnr": m.psnr(u8(out_torch), hr), "ssim": m.ssim(u8(out_torch), hr)}
    rec = {
        "image": args.image,
        "hr_size": args.hr_size,
        "steps": args.steps,
        "config": "hidden=64 nb=8 nf=32 gc=16 mults=1|2|3|4 T=%d cosine" % args.steps,
        "jax_backend": jax_backend,
        "jax_vs_torch": {"psnr": jax_vs_torch_psnr, "ssim": jax_vs_torch_ssim},
        "jax_vs_hr": r_jax,
        "torch_vs_hr": r_torch,
        "delta_psnr_db": abs(r_jax["psnr"] - r_torch["psnr"]),
        "delta_ssim": abs(r_jax["ssim"] - r_torch["ssim"]),
    }
    print(json.dumps(rec, indent=2))
    existing = {}
    if args.append and os.path.exists(args.out):
        existing = json.load(open(args.out))
    existing[args.image] = rec
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"| wrote {args.out}")


if __name__ == "__main__":
    main()
