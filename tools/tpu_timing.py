"""Correct timing on the axon-tunnel TPU backend.

Two pitfalls make naive timing wrong here:

1. ``jax.block_until_ready`` does NOT wait for device execution on the
   tunnel platform — only a host fetch (``np.asarray`` / ``float(...)``)
   truly synchronises (measured: a 2.7-TFLOP UNet forward "completes" in
   0.3 ms under block_until_ready, 75 ms under a scalar fetch).
2. The host↔device RPC round-trip is milliseconds, so per-call timing of
   sub-10ms ops is all launch latency.

``time_op`` solves both: it chains the op K times inside ONE ``lax.scan``
(sequential on-device dependency, no per-iteration RTT) and synchronises by
fetching a scalar reduction of the final carry. Fixed cost (launch + RTT +
reduce) is measured separately with K=0 and subtracted.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _chain(f, x, k: int):
    @jax.jit
    def run(x, *consts):
        def step(h, _):
            return f(h, *consts), None

        h, _ = jax.lax.scan(step, x, None, length=k)
        return jnp.sum(h.astype(jnp.float32))

    return run


def time_op(f, x, iters: int = 20, reps: int = 3, consts=()) -> float:
    """Median per-application seconds of ``f`` (shape-preserving) on device.

    Large side inputs must go in ``consts`` (threaded as jit arguments), not a
    Python closure: closed-over arrays become HLO constants and the tunnel's
    remote_compile endpoint rejects program bodies over its size limit (413).
    """
    run_k = _chain(f, x, iters)
    run_0 = _chain(f, x, 0)
    float(run_k(x, *consts))  # compile
    float(run_0(x, *consts))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_k(x, *consts))
        t1 = time.perf_counter()
        float(run_0(x, *consts))
        t2 = time.perf_counter()
        ts.append(((t1 - t0) - (t2 - t1)) / iters)
    return float(np.median(ts))


def time_fn(f, *args, reps: int = 5) -> float:
    """Median seconds of one call of ``f(*args)`` including a scalar-fetch
    sync (for whole-program timing where RTT is negligible)."""

    @jax.jit
    def run(*a):
        out = f(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves if hasattr(l, "astype"))

    float(run(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))
