"""Capture a device trace of the op-point sampler scan and print the
per-HLO-op time table (the measured basis for chain-kernel coverage
decisions — VERDICT r3 next #2 asked for exactly this instead of
region-isolated extrapolation).

Writes the raw .xplane.pb under PROF_DIR (default /tmp/dgmsr_prof) and, if
the xprof/tensorboard-plugin-profile converters are importable, prints the
top self-time HLO ops of the longest-running TPU step.

Env: B (8), STEPS (20), ETA (1.0), PROF_DIR.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.inference import SRDiffPipeline
from dgm_img_super_resolution_tpu.ops.resize import resize

B = int(os.environ.get("B", "8"))
STEPS = int(os.environ.get("STEPS", "20"))
ETA = float(os.environ.get("ETA", "1.0"))
LR = 128
PROF_DIR = os.environ.get("PROF_DIR", "/tmp/dgmsr_prof")

hp = Hparams(compute_dtype="bfloat16", sampler="ddim", sample_timesteps=STEPS,
             ddim_eta=ETA)
pipe = SRDiffPipeline(hp)
d = pipe.diffusion
params = pipe.params
x_lr = jnp.asarray(np.random.default_rng(0).random((B, LR, LR, 3), np.float32) * 2 - 1)


@jax.jit
def serve(params, img_lr, r):
    img_lr_up = resize(img_lr, (LR * 4, LR * 4), variant="torch")
    img, _ = d.ddim_sample(params, img_lr, img_lr_up, r, num_steps=STEPS, eta=ETA)
    out = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
    return jnp.sum(out.astype(jnp.float32))


r = jax.random.PRNGKey(0)
print("compiling...", flush=True)
float(serve(params, x_lr, r))  # compile outside the trace
print("tracing...", flush=True)
with jax.profiler.trace(PROF_DIR):
    for i in range(2):
        float(serve(params, x_lr, jax.random.PRNGKey(i)))

planes = sorted(glob.glob(os.path.join(PROF_DIR, "**", "*.xplane.pb"),
                          recursive=True), key=os.path.getmtime)
if not planes:
    print("no xplane.pb captured — device tracing unsupported on this backend")
    sys.exit(1)
xplane = planes[-1]
print(f"captured {xplane} ({os.path.getsize(xplane)/1e6:.1f} MB)")

# --- convert to the op-profile / hlo-stats tables -------------------------
sessiondir = os.path.dirname(xplane)
tool_data = None
for modname in ("xprof.convert.raw_to_tool_data",
                "tensorboard_plugin_profile.convert.raw_to_tool_data"):
    try:
        import importlib

        tool_data = importlib.import_module(modname)
        break
    except Exception:
        continue
if tool_data is None:
    print("no converter importable; raw xplane kept for offline analysis")
    sys.exit(0)

params_ = {"graph_viewer_options": {}}
try:
    data, _ = tool_data.xspace_to_tool_data([xplane], "hlo_stats", params_)
    out = os.path.join(PROF_DIR, "hlo_stats.json")
    if isinstance(data, bytes):
        data = data.decode("utf-8", "ignore")
    with open(out, "w") as f:
        f.write(data)
    rows = json.loads(data)
    # gviz table: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
    cols = [c.get("label") or c.get("id") for c in rows["cols"]]

    def col(name):
        for i, c in enumerate(cols):
            if c and name.lower() in str(c).lower():
                return i
        return None

    i_name = col("HLO expression") or col("name") or 0
    i_cat = col("category")
    i_self = col("total self time (us)") or col("self time")
    i_pct = col("self time (%)")
    recs = []
    for rrow in rows["rows"]:
        c = rrow["c"]
        recs.append((
            float(c[i_self]["v"]) if i_self is not None else 0.0,
            float(c[i_pct]["v"]) if i_pct is not None else 0.0,
            str(c[i_cat]["v"]) if i_cat is not None else "",
            str(c[i_name]["v"])[:140],
        ))
    recs.sort(reverse=True)
    print(f"\ntop HLO ops by self time ({cols[i_self]}):")
    for s, p, cat, nm in recs[:40]:
        print(f"{s:12.0f} us  {p:5.2f}%  {cat:24s} {nm}")
except Exception as e:
    print(f"hlo_stats conversion failed: {e!r}; raw xplane kept at {xplane}")
