"""A/B bicubic-resize formulations at the op point (8x128x128x3 -> 512x512,
torch align_corners=True variant). The production path costs 27.4 ms for
~0.4 GFLOP (prep_decomp) — layout, not FLOPs. Candidates:

  a) current: einsum "oh,nhwc->nowc" then "pw,nowc->nopc" (C=3 minor)
  b) NCHW batched matmul: transpose to (n*c, h, w), Mh @ X @ Mw^T, transpose back
  c) same as (b) but contraction in bf16 (weights+data), f32 accumulate
  d) one-shot kron: reshape to (n, h*w, c) and apply (Oh*Ow, h*w) kron matrix
     — only viable for small in sizes (128*128=16k rows); skipped if too big
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from dgm_img_super_resolution_tpu.ops.resize import resize, resize_matrix

B, H, W, C, S = 8, 128, 128, 3, 4
OH, OW = H * S, W * S
x = jnp.asarray(np.random.default_rng(0).random((B, H, W, C), np.float32) * 2 - 1)

mh = jnp.asarray(resize_matrix(H, OH, "torch", "bicubic"))
mw = jnp.asarray(resize_matrix(W, OW, "torch", "bicubic"))


def timeit(name, f, *a, reps=10):
    jf = jax.jit(f)
    r0 = jf(*a)
    jax.block_until_ready(r0)
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(*a))
        out.append(time.perf_counter() - t0)
    m = float(np.median(out)) * 1e3
    print(f"{name:44s} {m:8.2f} ms")
    return m, r0


def cur(x):
    return resize(x, (OH, OW), variant="torch")


def nchw(x):
    xf = x.astype(jnp.float32)
    v = jnp.transpose(xf, (0, 3, 1, 2)).reshape(B * C, H, W)
    y = jnp.einsum("oh,bhw->bow", mh, v)
    y = jnp.einsum("bow,pw->bop", y, mw)
    return jnp.transpose(y.reshape(B, C, OH, OW), (0, 2, 3, 1))


def nchw_bf16(x):
    v = jnp.transpose(x.astype(jnp.bfloat16), (0, 3, 1, 2)).reshape(B * C, H, W)
    y = jnp.einsum("oh,bhw->bow", mh.astype(jnp.bfloat16), v,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("bow,pw->bop", y, mw.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    return jnp.transpose(y.reshape(B, C, OH, OW), (0, 2, 3, 1))


t_cur, r_cur = timeit("current einsum NHWC (prod)", cur, x)
t_nchw, r_nchw = timeit("NCHW batched matmul f32", nchw, x)
t_bf16, r_bf16 = timeit("NCHW batched matmul bf16", nchw_bf16, x)

err_nchw = float(jnp.max(jnp.abs(r_cur - r_nchw)))
err_bf16 = float(jnp.max(jnp.abs(r_cur - r_bf16)))
print(f"\nmax|nchw - cur|  = {err_nchw:.3e}")
print(f"max|bf16 - cur|  = {err_bf16:.3e}")
