"""Tensor/host utilities — TPU realisations of the reference's helper layer
(``srdiff/model.py:63-75, 1315-1402``).

The reference's ``reduce_tensors`` (a dead ``dist.all_reduce`` helper) becomes
:func:`reduce_metrics` — a ``jax.lax.pmean`` over a named mesh axis, used
*inside* jitted steps where GSPMD lowers it to an ICI all-reduce. Host↔device
movement uses ``jax.device_put/device_get`` instead of ``.cuda()`` plumbing.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import jax
import jax.numpy as jnp


def reduce_metrics(metrics: Any, axis_name: str = "dp") -> Any:
    """Mesh-average a pytree of scalars inside a jitted/shard_mapped step
    (the working version of reference ``reduce_tensors``, model.py:1315-1324)."""
    return jax.tree_util.tree_map(lambda v: jax.lax.pmean(v, axis_name), metrics)


def tensors_to_scalars(tensors: Any) -> Any:
    """Pytree of 0-d arrays → python floats (reference model.py:1327-1340)."""
    return jax.tree_util.tree_map(
        lambda v: float(np.asarray(v).reshape(())) if hasattr(v, "shape") and np.size(v) == 1 else v,
        tensors,
    )


def tensors_to_np(tensors: Any) -> Any:
    """Pytree of device arrays → numpy (reference model.py:1343-1369)."""
    return jax.tree_util.tree_map(
        lambda v: np.asarray(v) if isinstance(v, (jnp.ndarray, jax.Array)) else v, tensors
    )


def to_host(tree: Any) -> Any:
    """Device → host (reference ``move_to_cpu``, model.py:1372-1380)."""
    return jax.device_get(tree)


def to_device(tree: Any, device=None, sharding=None) -> Any:
    """Host → device/HBM (reference ``move_to_cuda``, model.py:1383-1402).
    Pass a ``Sharding`` to place onto a mesh."""
    target = sharding if sharding is not None else device
    return jax.tree_util.tree_map(lambda v: jax.device_put(v, target), tree)


def set_seed(seed: int = 42) -> "jax.Array":
    """Seed host-side RNGs and return the jax PRNGKey (the working version of
    the reference's ``set_seed``, wgan-gp.ipynb cell 5 — in jax, determinism
    on device comes from explicit keys, not global state)."""
    import os
    import random

    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def make_run_dir(base: str, name: str = "run") -> str:
    """Timestamped run directory (reference wgan-gp.ipynb cell 5's
    timezone-stamped dirs)."""
    import datetime
    import os

    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    path = os.path.join(base, f"{name}_{stamp}")
    os.makedirs(path, exist_ok=True)
    return path


def cycle(dl: Iterable) -> Iterator:
    """Endless iterator over a dataloader (reference model.py:63-66)."""
    while True:
        for data in dl:
            yield data


def num_to_groups(num: int, divisor: int) -> list[int]:
    """Split ``num`` into ``divisor``-sized groups + remainder
    (reference model.py:69-75)."""
    groups = num // divisor
    remainder = num % divisor
    arr = [divisor] * groups
    if remainder > 0:
        arr.append(remainder)
    return arr


def plot_img(img, path: str) -> None:
    """Save an HWC [-1,1] or [0,1] float (or uint8) image to ``path``
    (reference ``plot_img``, model.py:1458-1461, without matplotlib)."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        if arr.min() < -0.01:  # [-1,1] convention
            arr = (arr + 1.0) * 127.5
        else:
            arr = arr * 255.0
        arr = np.round(np.clip(arr, 0, 255)).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
