"""Training-throughput benchmark: the SRDiff train step at the config's shape.

Measures what the reference config keys describe (``srdiff/config.yaml:1,33,
35``: batch 64, lr 2e-4, 400k updates on 160² HR crops — the upstream
SRDiff training recipe) on the real chip: steps/s, images/s, and the step
decomposition, recorded in TRAIN_BENCH.json (VERDICT r3 next #6).

Usage:
    python tools/train_bench.py                 # real TPU, full shape
    BENCH_BATCH=16 python tools/train_bench.py  # smaller batch
    TRAIN_BENCH_MESH=dp=4,sp=2 JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/train_bench.py --tiny      # virtual-mesh scaling sanity
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tiny = "--tiny" in sys.argv
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
        )
    except Exception:
        pass

    from dgm_img_super_resolution_tpu.core.config import Hparams
    from dgm_img_super_resolution_tpu.parallel.mesh import make_mesh
    from dgm_img_super_resolution_tpu.train.tasks.srdiff import SRDiffTask

    if tiny:
        hp = Hparams(
            compute_dtype="float32", hidden_size=16, rrdb_num_block=3,
            rrdb_num_feat=16, timesteps=8, val_check_interval=0,
        )
        batch_n, hr = int(os.environ.get("BENCH_BATCH", "8")), 32
    else:
        # the config the keys describe: full models, batch 64, 160² HR crops,
        # bf16 compute (config.yaml:1 batch_size, patch_size 160)
        hp = Hparams(compute_dtype="bfloat16", val_check_interval=0)
        batch_n = int(os.environ.get("BENCH_BATCH", "64"))
        hr = int(os.environ.get("BENCH_PATCH", "160"))

    mesh_spec = os.environ.get("TRAIN_BENCH_MESH", "")
    mesh = make_mesh(mesh_spec)
    task = SRDiffTask(hp)
    trainer = task.make_trainer(mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))

    scale = hp["sr_scale"]
    g = np.random.default_rng(0)
    batch = {
        "hr": jnp.asarray(g.uniform(-1, 1, (batch_n, hr, hr, 3)), jnp.float32),
        "lr": jnp.asarray(g.uniform(-1, 1, (batch_n, hr // scale, hr // scale, 3)), jnp.float32),
        "lr_up": jnp.asarray(g.uniform(-1, 1, (batch_n, hr, hr, 3)), jnp.float32),
    }
    axes = tuple(mesh.axis_names)
    spec = NamedSharding(mesh, P(axes[0], axes[1] if len(axes) > 1 else None))
    batch = jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), batch)
    step_fn = trainer.compile_step(batch_sharding=spec)

    # warmup / compile
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    loss0 = float(metrics["loss"])  # syncs
    compile_s = time.perf_counter() - t0

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(2 + i))
    loss = float(metrics["loss"])  # sync once at the end
    dt = time.perf_counter() - t0

    result = {
        "metric": "srdiff_train_steps_per_sec",
        "value": round(iters / dt, 4),
        "images_per_sec": round(batch_n * iters / dt, 2),
        "step_ms": round(1000 * dt / iters, 2),
        "batch": batch_n,
        "hr_crop": hr,
        "compute_dtype": hp["compute_dtype"],
        "mesh": mesh_spec or f"dp={mesh.devices.size}",
        "n_devices": int(mesh.devices.size),
        "tiny": tiny,
        "compile_s": round(compile_s, 1),
        "loss_first": round(loss0, 4),
        "loss_last": round(loss, 4),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    if os.environ.get("TRAIN_BENCH_OUT"):
        with open(os.environ["TRAIN_BENCH_OUT"], "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
