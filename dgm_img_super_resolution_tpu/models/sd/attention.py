"""Attention primitives for the SD pipeline (NHWC / NLC, MXU-shaped).

Self- and cross-attention used by the Transformer2D blocks. The default path
is plain XLA einsum attention (fused well by the compiler at ≤4k tokens);
for the 128×128-latent self-attention (16k tokens) the Pallas flash-attention
kernel in ``ops/pallas/attention.py`` is used when enabled — O(N) memory
instead of materialising the 16k×16k score matrix.

Reference capability: the attention inside the ``diffusers``
``StableDiffusionUpscalePipeline`` dependency (reference ``st_app2.py:15-27``
pulls it as a black box; SURVEY.md §2.8 fixes it as a component to build).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgm_img_super_resolution_tpu.models.layers import gn_groups as _gn

Dtype = Any


def attention(q, k, v, *, use_flash: bool = False):
    """q: (B, Lq, H, D); k/v: (B, Lk, H, D) → (B, Lq, H, D)."""
    if use_flash:
        from dgm_img_super_resolution_tpu.ops.pallas.attention import flash_attention

        return flash_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention (diffusers ``Attention`` equivalent)."""

    heads: int
    head_dim: int
    out_dim: int
    use_flash: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, lq = q.shape[0], q.shape[1]
        lk = k.shape[1]
        q = q.reshape(b, lq, self.heads, self.head_dim)
        k = k.reshape(b, lk, self.heads, self.head_dim)
        v = v.reshape(b, lk, self.heads, self.head_dim)
        # flash path requires self-attention-sized kv; cross-attn (77 tokens)
        # is cheap either way, so only route self-attention through Pallas.
        use_flash = self.use_flash and lq == lk and lq >= 1024
        out = attention(q, k, v, use_flash=use_flash)
        out = out.reshape(b, lq, inner)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers convention)."""

    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = nn.Dense(dim * self.mult * 2, dtype=self.dtype, name="proj_in")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU: diffusers GEGLU calls F.gelu, whose torch default
        # is the erf form — jax.nn.gelu defaults to the tanh approximation
        # (~1e-3 apart), which the torch twins flagged
        h = a * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(dim, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    head_dim: int
    use_flash: bool = False
    dtype: Dtype = jnp.float32
    only_cross_attention: bool = False
    """The published x4-upscaler UNet sets ``only_cross_attention`` on its
    three cross-attn down/up levels: attn1 (normally self-attention) then
    attends to the text states too (diffusers ``BasicTransformerBlock``
    semantics) — its to_k/to_v take the 1024-wide encoder states."""

    @nn.compact
    def __call__(self, x, context=None):
        # torch nn.LayerNorm default eps=1e-5 (diffusers BasicTransformerBlock
        # uses it); flax defaults to 1e-6 — pinned by the torch twins
        dim = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        ctx1 = context if self.only_cross_attention else None
        x = x + MultiHeadAttention(
            self.heads, self.head_dim, dim, self.use_flash, self.dtype, name="attn1"
        )(h, ctx1)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + MultiHeadAttention(
            self.heads, self.head_dim, dim, self.use_flash, self.dtype, name="attn2"
        )(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(dtype=self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    """Spatial transformer: GroupNorm → 1×1 proj → N transformer blocks over
    flattened pixels → 1×1 proj, residual."""

    heads: int
    head_dim: int
    depth: int = 1
    use_flash: bool = False
    dtype: Dtype = jnp.float32
    only_cross_attention: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        n, h, w, c = x.shape
        res = x
        y = nn.GroupNorm(num_groups=_gn(c), dtype=self.dtype, name="norm")(x)
        y = nn.Dense(c, dtype=self.dtype, name="proj_in")(y.reshape(n, h * w, c))
        for i in range(self.depth):
            y = BasicTransformerBlock(
                self.heads, self.head_dim, self.use_flash, self.dtype,
                self.only_cross_attention, name=f"block_{i}",
            )(y, context)
        y = nn.Dense(c, dtype=self.dtype, name="proj_out")(y)
        return res + y.reshape(n, h, w, c)
