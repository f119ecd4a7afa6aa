"""Tests for kaiming re-init, functional weight norm, and noise_like."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.diffusion import noise_like
from dgm_img_super_resolution_tpu.models import kaiming_init, wn_merge, wn_split

TINY = dict(
    hidden_size=8,
    rrdb_num_block=2,
    rrdb_num_feat=8,
    timesteps=8,
    unet_dim_mults="1|2",
    patch_size=16,
    batch_size=2,
    compute_dtype="float32",
)


def _tiny_params():
    from dgm_img_super_resolution_tpu.models.factory import build_srdiff, init_srdiff_params

    hp = Hparams(TINY)
    d = build_srdiff(hp)
    return d, hp, init_srdiff_params(d, jax.random.PRNGKey(0), hp, hr_size=16)


def test_wn_split_merge_roundtrip():
    _, _, params = _tiny_params()
    vg = wn_split(params["denoise_fn"])
    back = wn_merge(vg)
    flat_a = jax.tree_util.tree_leaves(params["denoise_fn"])
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_wn_split_structure():
    _, _, params = _tiny_params()
    vg = wn_split(params["denoise_fn"])
    # a conv kernel leaf becomes {v, g} with g shaped (1,1,1,Cout)
    leaf = vg["final_conv"]["kernel"]
    assert set(leaf.keys()) == {"v", "g"}
    assert leaf["g"].shape == (1, 1, 1, leaf["v"].shape[-1])
    # biases untouched
    assert vg["final_conv"]["bias"].ndim == 1


@pytest.mark.slow
def test_kaiming_init_statistics():
    _, _, params = _tiny_params()
    new = kaiming_init(jax.random.PRNGKey(1), params["denoise_fn"])
    k = np.asarray(new["mid_block1"]["block1"]["conv"]["kernel"])
    fan_in = k.shape[0] * k.shape[1] * k.shape[2]
    expected_std = np.sqrt(2.0 / fan_in)
    assert abs(k.std() - expected_std) / expected_std < 0.35
    # biases zeroed
    assert np.all(np.asarray(new["mid_block1"]["block1"]["conv"]["bias"]) == 0)
    # different from the original
    old = np.asarray(params["denoise_fn"]["mid_block1"]["block1"]["conv"]["kernel"])
    assert not np.allclose(k, old)


def test_weight_init_hparam_flows_through_factory():
    from dgm_img_super_resolution_tpu.models.factory import build_srdiff, init_srdiff_params

    hp = Hparams(TINY, weight_init=True)
    d = build_srdiff(hp)
    p = init_srdiff_params(d, jax.random.PRNGKey(0), hp, hr_size=16)
    b = np.asarray(p["denoise_fn"]["final_conv"]["bias"])
    assert np.all(b == 0)


@pytest.mark.slow
def test_use_wn_training_step():
    from dgm_img_super_resolution_tpu.train.tasks.srdiff import SRDiffTask

    hp = Hparams(TINY, use_wn=True, lr=1e-3)
    task = SRDiffTask(hp)
    params = task.init_params(jax.random.PRNGKey(0))
    # params are (v, g) pairs
    assert set(params["denoise_fn"]["final_conv"]["kernel"].keys()) == {"v", "g"}
    batch = {
        "hr": jnp.zeros((2, 16, 16, 3)),
        "lr": jnp.zeros((2, 4, 4, 3)),
        "lr_up": jnp.zeros((2, 16, 16, 3)),
    }
    loss, metrics = task.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # gradients flow to both v and g
    grads = jax.grad(lambda p: task.loss_fn(p, batch, jax.random.PRNGKey(1))[0])(params)
    g_leaf = grads["denoise_fn"]["final_conv"]["kernel"]
    assert float(jnp.abs(g_leaf["v"]).sum()) > 0
    assert float(jnp.abs(g_leaf["g"]).sum()) > 0


def test_noise_like_repeat():
    n = noise_like(jax.random.PRNGKey(0), (4, 3, 3, 2), repeat=True)
    assert n.shape == (4, 3, 3, 2)
    np.testing.assert_array_equal(np.asarray(n[0]), np.asarray(n[3]))
    n2 = noise_like(jax.random.PRNGKey(0), (4, 3, 3, 2), repeat=False)
    assert not np.allclose(np.asarray(n2[0]), np.asarray(n2[1]))
