"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated without TPU hardware by faking eight
host devices (the TPU-native analog of a fake backend — SURVEY.md §4). These
env vars must be set before the first ``import jax`` anywhere in the test
session, which pytest guarantees by importing conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's site config pins jax_platforms to "axon,cpu" (the TPU tunnel),
# which overrides the env var — force CPU explicitly for the test session.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: OFF by default. The suite is
# compile-dominated on this 1-core host and the cache cuts warm reruns ~7×
# (measured 21.8 s → 3.2 s for the tiny sampler scan) — but jaxlib 0.9.0's
# cache-entry *deserializer* (compilation_cache.py get_executable_and_time)
# intermittently SIGSEGVs re-loading an entry written earlier in the same
# process (observed twice across rounds, both in full-suite runs, different
# tests; never reproducible standalone — a nondeterministic jaxlib
# serialize/deserialize race). Raising min_compile_time to 10 s shrank the
# window but a round-5 full-suite run still crashed deserializing a large
# (>10 s) sampler-scan entry, so the only robust default is no persistent
# cache: a green suite matters more than warm-rerun speed. Opt back in for
# local iteration with JAX_TEST_CACHE_DIR=/tmp/jax_test_cache (accepting
# the rare crash + rerun).
_cache_dir = os.environ.get("JAX_TEST_CACHE_DIR", "")
if _cache_dir and _cache_dir.lower() not in ("off", "0"):
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-executable references after each test module.

    Two full-suite runs this round died in nondeterministic jaxlib-0.9.0
    segfaults (one in the persistent-cache deserializer, one inside
    XLA:CPU backend_compile itself), both deep into the run in the same
    compile-heavy module — and never standalone. The common factor is a
    single process accumulating hundreds of live executables; clearing
    JAX's traces/executable caches at module boundaries bounds that state
    (intra-module reuse is unaffected, and with the persistent cache off
    by default cross-module reuse was already cold)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
