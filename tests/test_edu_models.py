"""Educational model-family tests: AE/VAE, GAN/DCGAN/WGAN-GP, DDPM — training
steps descend and samplers produce finite, correctly-shaped outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # short training runs per model; excluded from the default run

from dgm_img_super_resolution_tpu.core.config import Hparams
from dgm_img_super_resolution_tpu.data.mnist import synthetic_mnist, to_model_input
from dgm_img_super_resolution_tpu.train.tasks.gan import GANTask
from dgm_img_super_resolution_tpu.train.tasks.vae import AETask, DDPMTask, VAETask

HP = Hparams(
    compute_dtype="float32",
    lr=1e-3,
    clip_grad_norm=10.0,
    val_check_interval=0,
    tb_log_interval=1000,
)


@pytest.fixture(scope="module")
def mnist32():
    imgs, labels = synthetic_mnist(64, seed=0)
    x = to_model_input(imgs, 32)  # [-1,1]
    return x


def test_synthetic_mnist_deterministic():
    a, la = synthetic_mnist(16, seed=3)
    b, lb = synthetic_mnist(16, seed=3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(la, lb)
    assert a.shape == (16, 28, 28) and a.dtype == np.uint8


def test_autoencoder_trains(mnist32):
    task = AETask(HP)
    trainer = task.make_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = {"x": jnp.asarray((mnist32 + 1) / 2)}  # [0,1] for sigmoid decoder
    losses = []
    for i in range(5):
        state, m = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_vae_elbo_trains_and_samples(mnist32):
    task = VAETask(HP, latent_dim=8)
    trainer = task.make_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = {"x": jnp.asarray((mnist32 + 1) / 2)}
    losses = []
    for i in range(5):
        state, m = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
        assert float(m["kl"]) >= 0
    assert losses[-1] < losses[0]
    samples = task.sample(jax.device_get(state.params), jax.random.PRNGKey(9), n=4)
    assert samples.shape == (4, 32, 32, 1)
    s = np.asarray(samples)
    assert s.min() >= 0 and s.max() <= 1


@pytest.mark.parametrize("kind", ["gan", "dcgan", "wgan-gp"])
def test_gan_variants_step(kind, mnist32):
    hw = 28
    imgs, _ = synthetic_mnist(16, seed=1)
    x = jnp.asarray(to_model_input(imgs, hw))
    task = GANTask(HP, kind=kind, img_shape=(hw, hw, 1))
    state = task.init_state(jax.random.PRNGKey(0))
    step = task.jitted_step()
    for i in range(2):
        state, metrics = step(state, x, jax.random.PRNGKey(i))
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["disc_loss"]))
    assert np.isfinite(float(metrics["gen_loss"]))
    if kind == "wgan-gp":
        assert "gp" in metrics and np.isfinite(float(metrics["gp"]))
    fake = task.generate(state, jax.random.PRNGKey(5), 3)
    assert fake.shape == (3, hw, hw, 1)
    f = np.asarray(fake)
    assert f.min() >= -1.0 and f.max() <= 1.0  # tanh head


def test_wgan_gp_penalty_is_grad_of_grad(mnist32):
    """GP must differentiate through the critic's input gradient: check that
    the critic update changes parameters even with equal real/fake inputs."""
    task = GANTask(HP, kind="wgan-gp", img_shape=(28, 28, 1))
    state = task.init_state(jax.random.PRNGKey(0))
    imgs, _ = synthetic_mnist(8, seed=2)
    x = jnp.asarray(to_model_input(imgs, 28))
    before = jax.tree_util.tree_leaves(state.disc_params)[0].copy()
    state, _, extra = task._disc_update(state, x, jax.random.PRNGKey(1))
    after = jax.tree_util.tree_leaves(state.disc_params)[0]
    assert float(jnp.abs(after - before).max()) > 0
    assert float(extra["gp"]) >= 0


def test_ddpm_task_loss_and_sampling():
    hp = HP.replace(ddpm_dim=16, ddpm_timesteps=8)
    task = DDPMTask(hp, img_hw=16)
    trainer = task.make_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 16, 16, 1)).astype(np.float32))
    state, m = trainer.train_step(state, {"x": x}, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    samples = task.sample(jax.device_get(state.params), jax.random.PRNGKey(2), n=2)
    assert samples.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(samples)).all()


def test_gan_fit_with_val_and_model_io(tmp_path, mnist32):
    from dgm_img_super_resolution_tpu.utils import set_seed

    rng = set_seed(0)
    imgs, _ = synthetic_mnist(8, seed=3)
    x = jnp.asarray(to_model_input(imgs, 28))
    task = GANTask(HP, kind="wgan-gp", img_shape=(28, 28, 1))
    data = iter(lambda: x, None)
    state, results = task.fit(
        data, epochs=2, steps_per_epoch=1, rng=rng, val_iter=data, val_steps=1
    )
    assert len(results["gen_train_loss"]) == 2
    assert len(results["gen_val_loss"]) == 2
    assert all(np.isfinite(v) for v in results["disc_val_loss"])
    # save/load round trip
    task.save_model_info(state, str(tmp_path))
    loaded = task.load_model_info(str(tmp_path))
    a = jax.tree_util.tree_leaves(state.gen_params)[0]
    b = jax.tree_util.tree_leaves(loaded.gen_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_make_run_dir(tmp_path):
    from dgm_img_super_resolution_tpu.utils import make_run_dir

    p = make_run_dir(str(tmp_path), "exp")
    import os

    assert os.path.isdir(p) and "exp_" in os.path.basename(p)
