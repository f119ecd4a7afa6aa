"""Per-step noise-generation cost in the sampler: threefry (JAX default) vs
the partitionable rbg generator, for the (8,512,512,3) f32 noise drawn every
ancestral step. Chained-scan timing (tpu_timing.py)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from tools.tpu_timing import time_op

SHAPE = (8, 512, 512, 3)

def bench(impl):
    key = jax.random.key(0, impl=impl)
    def f(x):
        k = jax.random.fold_in(key, jnp.int32(jnp.sum(x[0, 0, 0]) * 0))
        return x + jax.random.normal(k, SHAPE, jnp.float32) * 1e-6
    x = jnp.zeros(SHAPE, jnp.float32)
    base = time_op(lambda t: t + 1e-6, x, iters=10)   # carry add cost
    dt = time_op(f, x, iters=10)
    print(f"{impl}: {(dt-base)*1e3:.2f} ms per draw (raw {dt*1e3:.2f}, base {base*1e3:.2f})")

for impl in ("threefry2x32", "rbg"):
    try:
        bench(impl)
    except Exception as e:
        print(impl, "FAILED", type(e).__name__, e)
