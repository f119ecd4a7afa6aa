"""Parameter-tree transforms: kaiming re-init and functional weight norm.

TPU-native realisations of two reference UNet options that are off in its
shipped config but part of its surface (``srdiff/model.py:78-95, 809-818,
849-856``):

- ``weight_init: true`` → the reference applies He(kaiming)-normal init to
  every conv/linear after construction. Here :func:`kaiming_init` rewrites
  the kernel leaves of an already-initialised param tree (biases zeroed),
  preserving the tree structure — no module changes needed.
- ``use_wn: true`` → the reference wraps conv/linear weights in torch
  ``weight_norm`` (w = g·v/‖v‖, per-output-channel) and strips it before
  sampling. In a functional stack that's a *pair of pure pytree maps*:
  :func:`wn_split` turns each kernel into ``{v, g}`` (what the optimizer
  sees), :func:`wn_merge` materialises the effective kernels (what
  ``Module.apply`` sees). "Removing" weight norm is just merging once.

Kernels are identified structurally: float leaves named ``kernel`` with
ndim ≥ 2 (HWIO convs and Dense matrices, output axis last).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


def _is_kernel(path) -> bool:
    last = path[-1]
    key = getattr(last, "key", None)
    return key == "kernel"


def _map_kernels(fn, params: Any) -> Any:
    """Apply ``fn(path, leaf)`` to kernel leaves, identity elsewhere."""

    def wrap(path, leaf):
        if _is_kernel(path) and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            return fn(path, leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(wrap, params)


# --------------------------------------------------------------- kaiming init
def kaiming_init(rng: jax.Array, params: Any, scale: float = 1.0) -> Any:
    """Re-sample every conv/dense kernel with He-normal (fan_in, ReLU gain)
    scaled by ``scale``; zero the biases. Equivalent surface to the
    reference's ``initialize_weights`` pass (``model.py:78-95``) applied when
    ``weight_init: true`` (``model.py:809-810``)."""
    leaves = []

    def collect(path, leaf):
        leaves.append(path)
        return leaf

    _map_kernels(collect, params)
    keys = dict(zip([jax.tree_util.keystr(p) for p in leaves],
                    jax.random.split(rng, max(len(leaves), 1))))

    def reinit(path, leaf):
        fan_in = int(jnp.prod(jnp.asarray(leaf.shape[:-1])))
        std = math.sqrt(2.0 / fan_in)
        k = keys[jax.tree_util.keystr(path)]
        return (scale * std) * jax.random.normal(k, leaf.shape, leaf.dtype)

    out = _map_kernels(reinit, params)

    def zero_bias(path, leaf):
        key = getattr(path[-1], "key", None)
        if key == "bias":
            return jnp.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(zero_bias, out)


# ---------------------------------------------------------------- weight norm
def wn_split(params: Any, eps: float = 1e-12) -> Any:
    """kernel → {"v": kernel, "g": ‖kernel‖ per output channel} (dict leaf),
    so ``wn_merge(wn_split(p)) == p`` exactly up to float rounding."""

    def split(_, w):
        norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=tuple(range(w.ndim - 1)), keepdims=True))
        return {"v": w, "g": norm + eps * 0}

    return _map_kernels(split, params)


def wn_merge(params: Any, eps: float = 1e-12) -> Any:
    """Inverse of :func:`wn_split`: materialise w = g·v/‖v‖ for every
    ``{v, g}`` kernel leaf (the functional "apply weight norm" — and, done
    once at the end of training, the reference's ``remove_weight_norm``,
    ``model.py:849-856``)."""

    def is_vg(x) -> bool:
        return isinstance(x, dict) and set(x.keys()) == {"v", "g"}

    def merge(x):
        v, g = x["v"], x["g"]
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=tuple(range(v.ndim - 1)), keepdims=True))
        return g * v / (norm + eps)

    return jax.tree_util.tree_map(lambda x: merge(x) if is_vg(x) else x, params, is_leaf=is_vg)
