"""Time the full-size SD x4-upscaler pipeline on the real TPU.

Reference headline: "~1 hour" end-to-end on CPU (st_app2.py:21). This times
the TPU-native pipeline at the reference app's operating point: 128×128
input → 512×512 output, 20 DDIM steps, CFG 9.0 (random-init weights — the
published checkpoint isn't downloadable here; compute cost is identical).
"""
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from dgm_img_super_resolution_tpu.models.sd.pipeline import StableDiffusionUpscalePipeline

BATCH = int(os.environ.get("SD_BATCH", "1"))
ENC = int(os.environ.get("SD_ENC", "1"))  # >1: encoder propagation A/B

pipe = StableDiffusionUpscalePipeline()
img = (np.random.rand(BATCH, 128, 128, 3) * 255).astype(np.uint8)

t0 = time.perf_counter()
out = pipe("a photo of a cat", img, num_inference_steps=20, enc_interval=ENC)
print(f"first call (incl. compile): {time.perf_counter()-t0:.1f}s out={out.shape} enc={ENC}",
      flush=True)

for i in range(2):
    t0 = time.perf_counter()
    out = pipe("a photo of a cat", img, num_inference_steps=20,
               rng=jax.random.PRNGKey(i + 1), enc_interval=ENC)
    dt = time.perf_counter() - t0
    print(f"steady-state: {dt:.2f}s / {BATCH} image(s) = {dt/BATCH:.2f}s per 512² upscale",
          flush=True)
