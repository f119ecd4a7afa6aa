"""Time the full-size SD x4-upscaler pipeline on the real TPU.

Reference headline: "~1 hour" end-to-end on CPU (st_app2.py:21), fp16+CUDA
required for practical use (README.md:42). This times the TPU-native
pipeline at the reference app's operating point: 128×128 input → 512×512
output, 20 DDIM steps, CFG 9.0 (random-init weights — the published
checkpoint isn't downloadable here; compute cost is identical).

Env knobs: SD_BATCH (default 1), SD_ENC (encoder-propagation interval),
SD_FLASH=1 (Pallas flash attention in the UNet — A/B at the production
128²-latent/16k-token self-attention), SD_STEPS, SD_OUT (write a JSON
artifact). Emits one JSON line with p50/steady-state timings.
"""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from dgm_img_super_resolution_tpu.models.sd.pipeline import StableDiffusionUpscalePipeline

BATCH = int(os.environ.get("SD_BATCH", "1"))
ENC = int(os.environ.get("SD_ENC", "1"))  # >1: encoder propagation A/B
FLASH = os.environ.get("SD_FLASH", "1") not in ("0", "false", "")
STEPS = int(os.environ.get("SD_STEPS", "20"))

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
except Exception:
    pass

from dgm_img_super_resolution_tpu.ckpt.sd_inventory import X4_UNET_CONFIG
from dgm_img_super_resolution_tpu.models.sd.unet import UNet2DCondition

pipe = StableDiffusionUpscalePipeline(
    unet=UNet2DCondition.from_config(X4_UNET_CONFIG, dtype=jnp.bfloat16, use_flash=FLASH),
)
img = (np.random.rand(BATCH, 128, 128, 3) * 255).astype(np.uint8)

t0 = time.perf_counter()
out = pipe("a photo of a cat", img, num_inference_steps=STEPS, enc_interval=ENC)
compile_s = time.perf_counter() - t0
print(f"first call (incl. compile): {compile_s:.1f}s out={out.shape} "
      f"enc={ENC} flash={FLASH}", flush=True)

lats = []
for i in range(int(os.environ.get("SD_ITERS", "3"))):
    t0 = time.perf_counter()
    out = pipe("a photo of a cat", img, num_inference_steps=STEPS,
               rng=jax.random.PRNGKey(i + 1), enc_interval=ENC)
    dt = time.perf_counter() - t0
    lats.append(dt)
    print(f"steady-state: {dt:.2f}s / {BATCH} image(s) = {dt/BATCH:.2f}s per 512² upscale",
          flush=True)

p50 = float(np.percentile(lats, 50))
result = {
    "metric": "sd_x4_512_upscale_p50_s",
    "value": round(p50 / BATCH, 3),
    "images_per_sec": round(BATCH / p50, 4),
    "batch": BATCH,
    "steps": STEPS,
    "enc_interval": ENC,
    "use_flash": FLASH,
    "cfg": True,
    "compile_s": round(compile_s, 1),
    "baseline": "reference ~3600 s on CPU (st_app2.py:21)",
    "vs_baseline": round(3600.0 / (p50 / BATCH), 1),
    "backend": jax.default_backend(),
}
print(json.dumps(result))
if os.environ.get("SD_OUT"):
    with open(os.environ["SD_OUT"], "w") as f:
        json.dump(result, f, indent=1)
