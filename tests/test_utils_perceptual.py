"""Tests for utils (tensor helpers, profiling) and the VGG perceptual loss."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from dgm_img_super_resolution_tpu.metrics.perceptual import PerceptualLoss, VGG19Features
from dgm_img_super_resolution_tpu.utils import (
    StepTimer,
    cycle,
    num_to_groups,
    plot_img,
    reduce_metrics,
    tensors_to_np,
    tensors_to_scalars,
)


def test_vgg19_feature_shapes():
    net = VGG19Features()
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(params, x)
    # conv5_4 at 64/16 = 4: four maxpools before the last conv group
    assert feats.shape == (1, 4, 4, 512)


def test_perceptual_loss_from_torch_vgg19_keys(rng):
    """Importer consumes torchvision-style features.N.weight keys; parity of
    conv arithmetic is covered by the conv tests — here check mapping."""
    plan = [(64, 0, 3), (64, 2, 64), (128, 5, 64), (128, 7, 128),
            (256, 10, 128), (256, 12, 256), (256, 14, 256), (256, 16, 256),
            (512, 19, 256), (512, 21, 512), (512, 23, 512), (512, 25, 512),
            (512, 28, 512), (512, 30, 512), (512, 32, 512), (512, 34, 512)]
    sd = {}
    for out_c, idx, in_c in plan:
        sd[f"features.{idx}.weight"] = torch.randn(out_c, in_c, 3, 3) * 0.01
        sd[f"features.{idx}.bias"] = torch.randn(out_c) * 0.01
    loss = PerceptualLoss.from_torch_vgg19(sd)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    v = float(loss(x, y))
    assert np.isfinite(v) and v >= 0
    assert float(loss(x, x)) < 1e-8


def test_perceptual_maybe_create_missing():
    assert PerceptualLoss.maybe_create(None) is None
    assert PerceptualLoss.maybe_create("/nonexistent.npz") is None


def test_tensor_helpers():
    t = {"a": jnp.asarray(1.5), "b": [jnp.zeros((2, 2)), 3]}
    s = tensors_to_scalars({"a": jnp.asarray(1.5), "c": jnp.asarray([2.0])})
    assert s["a"] == 1.5 and s["c"] == 2.0
    n = tensors_to_np(t)
    assert isinstance(n["b"][0], np.ndarray)


def test_reduce_metrics_pmean():
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    x = jnp.arange(8.0)

    def f(v):
        return reduce_metrics({"m": v.sum()}, "dp")

    out = shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P())(x)
    assert float(out["m"]) == np.arange(8).mean()  # mean of per-shard sums


def test_cycle_and_groups():
    it = cycle([1, 2])
    assert [next(it) for _ in range(5)] == [1, 2, 1, 2, 1]
    assert num_to_groups(10, 4) == [4, 4, 2]
    assert num_to_groups(8, 4) == [4, 4]


def test_plot_img(tmp_path, rng):
    img = rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    plot_img(img, p)
    from PIL import Image

    assert np.asarray(Image.open(p)).shape == (8, 8, 3)


def test_step_timer():
    import time

    t = StepTimer()
    for _ in range(3):
        t.tick()
        time.sleep(0.01)
    assert t.steps_per_sec > 0
    assert t.p50_latency >= 0.01
