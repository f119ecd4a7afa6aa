"""Checkpoint tests: torch key-schema round-trip, full-coverage import, and
Orbax save/restore with keep-K retention."""

import jax
import numpy as np
import pytest
import torch

from dgm_img_super_resolution_tpu.ckpt.orbax_io import (
    get_all_ckpts,
    load_checkpoint,
    save_checkpoint,
)
from dgm_img_super_resolution_tpu.ckpt.torch_import import (
    convert_srdiff_state_dict,
    export_srdiff_to_torch_keys,
    import_srdiff_checkpoint,
)
from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.models.factory import build_srdiff, init_srdiff_params

TINY = Hparams(
    compute_dtype="float32",
    hidden_size=8,
    rrdb_num_block=3,
    rrdb_num_feat=8,
    timesteps=4,
)


@pytest.fixture(scope="module")
def tiny_params():
    d = build_srdiff(TINY)
    return init_srdiff_params(d, jax.random.PRNGKey(0), TINY, hr_size=16)


def _flat_leaves(tree):
    return {
        jax.tree_util.keystr(path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }


def test_torch_key_roundtrip_covers_every_param(tiny_params):
    torch_sd = export_srdiff_to_torch_keys(tiny_params)
    # every exported key follows the reference naming scheme
    assert all(k.startswith(("denoise_fn.", "rrdb.")) for k in torch_sd)
    assert any(".RDB1.conv1.weight" in k for k in torch_sd)
    assert any("downs.0.0.block1.block.1.weight" in k for k in torch_sd)
    back, unused = convert_srdiff_state_dict(torch_sd)
    assert unused == []
    a, b = _flat_leaves(tiny_params), _flat_leaves(back)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=0, err_msg=k)


def test_import_skips_diffusion_buffers(tiny_params):
    sd = export_srdiff_to_torch_keys(tiny_params)
    sd["betas"] = np.zeros(4)
    sd["posterior_variance"] = np.zeros(4)
    sd["ssim_loss.window"] = np.zeros((1, 1, 11, 11))
    back, unused = convert_srdiff_state_dict(sd)
    assert unused == []


def test_import_accepts_model_prefix_and_torch_tensors(tiny_params):
    sd = export_srdiff_to_torch_keys(tiny_params)
    prefixed = {f"model.{k}": torch.from_numpy(np.array(v)) for k, v in sd.items()}
    back, _ = convert_srdiff_state_dict(prefixed)
    a, b = _flat_leaves(tiny_params), _flat_leaves(back)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=0)


def test_import_full_torch_ckpt_file(tiny_params, tmp_path):
    sd = {k: torch.from_numpy(np.array(v)) for k, v in export_srdiff_to_torch_keys(tiny_params).items()}
    ckpt = {
        "global_step": 400000,
        "optimizer_states": [{}],
        "state_dict": {"model": sd},
    }
    path = tmp_path / "model_ckpt_steps_400000.ckpt"
    torch.save(ckpt, str(path))
    params, step = import_srdiff_checkpoint(str(path))
    assert step == 400000
    a, b = _flat_leaves(tiny_params), _flat_leaves(params)
    assert set(a) == set(b)


def test_strict_import_raises_on_unknown_key(tiny_params):
    sd = export_srdiff_to_torch_keys(tiny_params)
    sd["denoise_fn.unknown.weight"] = np.zeros(3)
    with pytest.raises(KeyError):
        convert_srdiff_state_dict(sd, strict=True)
    _, unused = convert_srdiff_state_dict(sd, strict=False)
    assert unused == ["denoise_fn.unknown.weight"]


def test_orbax_save_load_and_retention(tmp_path, tiny_params):
    work = str(tmp_path / "work")
    for step in [100, 200, 300]:
        save_checkpoint(
            {"params": jax.device_get(tiny_params), "global_step": step},
            work,
            step,
            num_ckpt_keep=2,
        )
    ckpts = get_all_ckpts(work)
    assert [c.split("_")[-1] for c in ckpts] == ["300", "200"]  # keep-2, newest first
    state, step = load_checkpoint(work)
    assert step == 300
    a, b = _flat_leaves(tiny_params), _flat_leaves(state["params"])
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=0)


def test_load_checkpoint_empty_dir(tmp_path):
    state, step = load_checkpoint(str(tmp_path / "nothing"))
    assert state is None and step == 0


def test_load_ckpt_partial_merge_and_shape_pruning(tiny_params, tmp_path):
    from dgm_img_super_resolution_tpu.ckpt.orbax_io import load_ckpt, save_checkpoint

    save_checkpoint({"params": tiny_params}, str(tmp_path), 7)
    import jax.numpy as jnp
    import jax

    # fresh target with one leaf reshaped → skipped under strict=False
    target = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), tiny_params)
    merged = load_ckpt(target, str(tmp_path), strict=False)
    src_leaf = np.asarray(jax.tree_util.tree_leaves(tiny_params)[0])
    out_leaf = np.asarray(jax.tree_util.tree_leaves(merged)[0])
    np.testing.assert_allclose(out_leaf, src_leaf)

    # subtree selection
    rrdb_only = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), tiny_params["rrdb"])
    merged_rrdb = load_ckpt(rrdb_only, str(tmp_path), model_name="rrdb", strict=True)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(merged_rrdb)[0]),
        np.asarray(jax.tree_util.tree_leaves(tiny_params["rrdb"])[0]),
    )

    # strict missing-key raises
    import pytest as _pytest

    with _pytest.raises((KeyError, ValueError)):
        load_ckpt({"nope": jnp.zeros((2,))}, str(tmp_path), strict=True)


def test_rrdb_ckpt_hparam_loads_encoder(tiny_params, tmp_path):
    from dgm_img_super_resolution_tpu.ckpt.orbax_io import save_checkpoint
    from dgm_img_super_resolution_tpu.core.config import Hparams
    from dgm_img_super_resolution_tpu.train.tasks.srdiff import SRDiffTask

    save_checkpoint({"params": tiny_params}, str(tmp_path), 3)
    hp = Hparams(
        hidden_size=8, rrdb_num_block=3, rrdb_num_feat=8, timesteps=4,
        unet_dim_mults="1|2", patch_size=16, compute_dtype="float32",
        rrdb_ckpt=str(tmp_path),
    )
    task = SRDiffTask(hp)
    import jax

    params = task.init_params(jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(params["rrdb"])[0]),
        np.asarray(jax.tree_util.tree_leaves(tiny_params["rrdb"])[0]),
    )


def test_torch_key_roundtrip_with_attention():
    """use_attn=True adds Residual(Rezero(LinearAttention)) params — their
    torch-schema mapping (mid_attn.fn.g / fn.fn.to_qkv / fn.fn.to_out) must
    round-trip too."""
    hp = Hparams(
        compute_dtype="float32", hidden_size=8, rrdb_num_block=3,
        rrdb_num_feat=8, timesteps=4, use_attn=True,
    )
    d = build_srdiff(hp)
    params = init_srdiff_params(d, jax.random.PRNGKey(1), hp, hr_size=16)
    sd = export_srdiff_to_torch_keys(params)
    assert "denoise_fn.mid_attn.fn.g" in sd
    assert "denoise_fn.mid_attn.fn.fn.to_qkv.weight" in sd
    back, unused = convert_srdiff_state_dict(sd)
    assert not unused
    for k_a, v_a in _flat_leaves(params).items():
        np.testing.assert_allclose(v_a, _flat_leaves(back)[k_a], atol=1e-6, err_msg=k_a)
