"""Trainer + multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.parallel.mesh import make_mesh, parse_mesh_shape, shard_batch
from dgm_img_super_resolution_tpu.train.tasks.srdiff import SRDiffTask
from dgm_img_super_resolution_tpu.train.trainer import make_lr_schedule

TINY = Hparams(
    compute_dtype="float32",
    hidden_size=8,
    rrdb_num_block=3,
    rrdb_num_feat=8,
    timesteps=4,
    lr=1e-3,
    clip_grad_norm=10.0,
    val_check_interval=0,
    tb_log_interval=2,
)


def test_eight_virtual_devices_present():
    assert jax.device_count() == 8


def test_parse_mesh_shape():
    assert parse_mesh_shape("", 8) == {"dp": 8}
    assert parse_mesh_shape("dp=4,sp=2", 8) == {"dp": 4, "sp": 2}
    with pytest.raises(ValueError):
        parse_mesh_shape("dp=3", 8)


def test_batch_shards_over_dp():
    mesh = make_mesh("dp=8")
    x = jnp.zeros((16, 4, 4, 3))
    xs = shard_batch(x, mesh)
    assert len(xs.sharding.device_set) == 8


def _make_batch(rng, n=8, hr=16, scale=4):
    hr_img = jnp.asarray(rng.uniform(-1, 1, (n, hr, hr, 3)).astype(np.float32))
    lr_img = jnp.asarray(rng.uniform(-1, 1, (n, hr // scale, hr // scale, 3)).astype(np.float32))
    return {"hr": hr_img, "lr": lr_img, "lr_up": hr_img * 0.5}


def test_srdiff_train_step_runs_on_mesh_and_descends(rng, tmp_path):
    task = SRDiffTask(TINY)
    trainer = task.make_trainer(mesh=make_mesh("dp=8"))
    trainer.work_dir = str(tmp_path)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _make_batch(rng)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert all(np.isfinite(losses))
    # same fixed batch → loss should drop substantially over a few steps
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_srdiff_train_step_dp_sp_mesh(rng, tmp_path):
    """dp×sp mesh: batch over dp AND image rows over sp — GSPMD inserts conv
    halo exchanges automatically."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh("dp=4,sp=2")
    task = SRDiffTask(TINY)
    trainer = task.make_trainer(mesh=mesh)
    trainer.work_dir = str(tmp_path)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _make_batch(rng)
    spec = NamedSharding(mesh, P("dp", "sp"))
    batch = jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), batch)
    # bypass trainer.shard_batch (which uses dp-only) to exercise 2-D sharding
    step_fn = trainer.compile_step(batch_sharding=spec)
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_fit_loop_smoke(rng, tmp_path):
    hp = TINY.replace(val_check_interval=4, num_ckpt_keep=2, max_updates=6)
    task = SRDiffTask(hp)
    trainer = task.make_trainer(mesh=make_mesh("dp=8"))
    trainer.work_dir = str(tmp_path)
    batch = _make_batch(rng)
    data = (batch for _ in range(100))
    state = trainer.fit(data, jax.random.PRNGKey(0), max_updates=6, resume=False)
    assert int(state.step) == 6
    # checkpoint written at step 4
    from dgm_img_super_resolution_tpu.ckpt.orbax_io import get_all_ckpts

    assert len(get_all_ckpts(str(tmp_path))) == 1
    # resume continues from the checkpoint
    state2 = trainer.fit((batch for _ in range(100)), jax.random.PRNGKey(0), max_updates=6)
    assert int(state2.step) == 6


def test_lr_schedule_step_decay():
    hp = TINY.replace(lr=1e-3, decay_steps=100)
    sched = make_lr_schedule(hp)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(150)) == pytest.approx(5e-4)
    assert float(sched(250)) == pytest.approx(2.5e-4)


def test_srdiff_val_fn_with_sample_metrics(rng, tmp_path):
    task = SRDiffTask(TINY)
    trainer = task.make_trainer(mesh=make_mesh("dp=8"))
    trainer.work_dir = str(tmp_path)
    state = trainer.init_state(jax.random.PRNGKey(0))
    val_batches = [_make_batch(rng) for _ in range(2)]
    val_fn = task.make_val_fn(val_batches, sample_metrics=True)
    out = val_fn(state)
    assert set(out) == {"loss", "psnr", "ssim"}
    assert np.isfinite(out["loss"]) and np.isfinite(out["psnr"])
    assert -1.0 <= out["ssim"] <= 1.0


def test_accumulate_grad_batches(rng, tmp_path):
    """With accumulation N, params change only every N micro-steps."""
    hp = TINY.replace(accumulate_grad_batches=2)
    task = SRDiffTask(hp)
    trainer = task.make_trainer(mesh=make_mesh("dp=8"))
    trainer.work_dir = str(tmp_path)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _make_batch(rng)
    p0 = jax.device_get(state.params["denoise_fn"]["final_conv"]["kernel"])
    state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    p1 = jax.device_get(state.params["denoise_fn"]["final_conv"]["kernel"])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: grads only stored
    state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    p2 = jax.device_get(state.params["denoise_fn"]["final_conv"]["kernel"])
    assert not np.allclose(p1, p2)  # second micro-step applies the update


def test_print_nan_grads_metric(rng, tmp_path):
    hp = TINY.replace(print_nan_grads=True)
    task = SRDiffTask(hp)
    trainer = task.make_trainer(mesh=make_mesh("dp=8"))
    trainer.work_dir = str(tmp_path)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, metrics = trainer.train_step(state, _make_batch(rng), jax.random.PRNGKey(1))
    assert int(metrics["nan_grads"]) == 0


def test_save_best_and_sanity_val(rng, tmp_path):
    hp = TINY.replace(
        val_check_interval=2, num_ckpt_keep=2, save_best=True,
        num_sanity_val_steps=1, valid_monitor_key="val_loss", valid_monitor_mode="min",
    )
    task = SRDiffTask(hp)
    trainer = task.make_trainer(mesh=make_mesh("dp=8"))
    trainer.work_dir = str(tmp_path)
    batch = _make_batch(rng)
    calls = []

    def val_fn(state):
        calls.append(1)
        return {"loss": 1.0 / len(calls)}  # strictly improving

    trainer.fit((batch for _ in range(10)), jax.random.PRNGKey(0), max_updates=4,
                val_fn=val_fn, resume=False)
    # sanity call + 2 val calls (steps 2, 4)
    assert len(calls) == 3
    from dgm_img_super_resolution_tpu.ckpt.orbax_io import get_all_ckpts

    assert len(get_all_ckpts(str(tmp_path))) == 2
    assert len(get_all_ckpts(str(tmp_path / "best"))) == 1  # keep=1 for best
    import os
    log = open(os.path.join(str(tmp_path), "metrics.jsonl")).read()
    assert "sanity_loss" in log
