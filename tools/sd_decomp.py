"""Decompose the SD x4-upscaler pipeline's 5.4 s/image: text encode vs the
20-step CFG UNet scan vs the VAE decode (128² latents → 512² RGB).

All timings host-fetch synced (block_until_ready is a no-op on the tunnel).
Run on the real TPU: ``python tools/sd_decomp.py``.
"""
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
)

from dgm_img_super_resolution_tpu.models.sd.pipeline import StableDiffusionUpscalePipeline

STEPS = int(os.environ.get("SD_STEPS", "20"))
pipe = StableDiffusionUpscalePipeline()
params = pipe.init_params(jax.random.PRNGKey(0))

img = jnp.asarray(np.random.rand(1, 128, 128, 3).astype(np.float32) * 2 - 1)


def timed(name, f, *a, reps=3):
    out = f(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))  # compile+sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.1f} ms", flush=True)
    return out


text_states = timed(
    "text encode (cond+uncond)", lambda: pipe.encode_prompt(params, ["a photo of a cat"])
)

x, img_aug = pipe._prepare(params, img, jax.random.PRNGKey(1), 20, 1)
sched_ts = jnp.linspace(999, 0, STEPS).astype(jnp.int32)
ts_prev = jnp.concatenate([sched_ts[1:], jnp.array([-1], jnp.int32)])

lat = timed(
    f"denoise segment ({STEPS} CFG UNet steps)",
    lambda: pipe._denoise_segment(
        params, x, img_aug, sched_ts, ts_prev, text_states, 9.0, 20, 1
    ),
)
print(f"  → per CFG step: see above /{STEPS}", flush=True)
timed("VAE decode 128²→512²", lambda: pipe._decode(params, lat))
