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


# transformers CLIPTextConfig layer_norm_eps (the published SD2 text_encoder
# config uses the default 1e-5); flax LayerNorm defaults to 1e-6 — pinned by
# the torch twins (tests/test_sd_torch_parity.py)
_LN_EPS = 1e-5


def _act(name: str):
    """hidden_act from the published config: the SD2-family OpenCLIP-H text
    tower uses exact-erf "gelu" (stabilityai/stable-diffusion-2 text_encoder
    config); the SD1-family OpenAI ViT-L tower uses "quick_gelu"."""
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return quick_gelu
    raise ValueError(f"unknown CLIP hidden_act {name!r}")


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
    hidden_act: str = "gelu"

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="ln1")(x)
        x = x + CLIPAttention(self.heads, self.dtype, name="attn")(h, mask)
        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(x.shape[-1] * 4, dtype=self.dtype, name="mlp_fc")(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_proj")(_act(self.hidden_act)(h))
        return x + h


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    max_len: int = 77
    width: int = 1024
    layers: int = 23
    heads: int = 16
    hidden_act: str = "gelu"  # SD2-family published config (exact GELU)
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
            x = CLIPBlock(self.heads, self.dtype, self.hidden_act, name=f"block_{i}")(x, causal)
        return nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="ln_final")(x)


def _basic_clean(text: str) -> str:
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2/CLIP reversible byte→unicode-char map: printable latin-1
    bytes map to themselves, everything else to U+0100..; guarantees every
    UTF-8 byte sequence becomes a string of vocab-alphabet characters with no
    whitespace/control chars (which would collide with the BPE's separators).
    Exact construction from the published CLIP ``simple_tokenizer``."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _clip_pattern():
    """CLIP's token regex needs unicode classes (\\p{L}/\\p{N}); the `regex`
    module ships with transformers. ASCII approximation as last resort."""
    try:
        import regex

        return regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            regex.IGNORECASE,
        )
    except ImportError:  # pragma: no cover
        return re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]+",
            re.IGNORECASE,
        )


class SimpleTokenizer:
    """Exact CLIP BPE tokenizer; hash-bucket fallback without vocab files.

    Two on-disk formats are accepted (both public):

    - the OpenAI ``bpe_simple_vocab_16e6.txt.gz`` merge list (``bpe_path``),
      from which the vocab is constructed exactly as CLIP's
      ``simple_tokenizer.SimpleTokenizer`` does: ``bytes_to_unicode`` alphabet
      → ``</w>`` word-final forms → merge strings → the two specials;
    - the HuggingFace ``vocab.json`` + ``merges.txt`` pair shipped with the
      SD x4-upscaler tokenizer (``vocab_json``/``merges_txt``) — the format
      the reference's diffusers pipeline loads (``st_app2.py:15-27``).

    Without files, a deterministic hash-bucket fallback preserves the
    shape/dtype contract (fixed 77-token rows, BOS/EOS, zero pad) so the
    pipeline runs hermetically in this zero-egress environment.
    Token-id equality with ``transformers.CLIPTokenizer`` is asserted in
    ``tests/test_clip_tokenizer.py`` on a locally built fixture vocab.
    """

    PAT = _clip_pattern()

    def __init__(
        self,
        bpe_path: str | None = None,
        vocab_size: int = 49408,
        max_len: int = 77,
        vocab_json: str | None = None,
        merges_txt: str | None = None,
        pad_token: str = "!",
    ):
        self.max_len = max_len
        self.pad_token = pad_token
        self._byte_encoder = bytes_to_unicode()
        self._bpe = None
        if bpe_path and os.path.exists(bpe_path):
            self._load_openai_bpe(bpe_path)
        elif vocab_json and merges_txt and os.path.exists(vocab_json):
            self._load_hf_bpe(vocab_json, merges_txt)
        if self._bpe is not None:
            encoder = self._bpe["encoder"]
            self.vocab_size = len(encoder)
            self.bos = encoder["<|startoftext|>"]
            self.eos = encoder["<|endoftext|>"]
        else:
            self.vocab_size = vocab_size
            self.bos = vocab_size - 2  # 49406 in CLIP
            self.eos = vocab_size - 1  # 49407 in CLIP

    def _load_openai_bpe(self, path: str) -> None:
        opener = gzip.open if path.endswith(".gz") else open
        merges = opener(path, "rt", encoding="utf-8").read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m.strip()]
        # CLIP vocab construction (simple_tokenizer.py): byte alphabet in
        # bytes_to_unicode order, then </w> forms, then merges, then specials
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self._bpe = {
            "ranks": {m: i for i, m in enumerate(merges)},
            "encoder": {v: i for i, v in enumerate(vocab)},
        }

    def _load_hf_bpe(self, vocab_json: str, merges_txt: str) -> None:
        import json

        encoder = json.load(open(vocab_json, encoding="utf-8"))
        lines = open(merges_txt, encoding="utf-8").read().strip().split("\n")
        if lines and lines[0].startswith("#version"):
            lines = lines[1:]
        merges = [tuple(m.split()) for m in lines if m.strip()]
        self._bpe = {
            "ranks": {m: i for i, m in enumerate(merges)},
            "encoder": encoder,
        }

    def _word_tokens(self, word: str) -> list[int]:
        if self._bpe is None:
            # hash-bucket fallback: deterministic id per word-piece
            h = 0
            for ch in word:
                h = (h * 131 + ord(ch)) % (self.vocab_size - 512)
            return [h + 256]
        # byte-encode the word through bytes_to_unicode (exact CLIP: every
        # UTF-8 byte becomes one alphabet char), last char word-final
        ranks, encoder = self._bpe["ranks"], self._bpe["encoder"]
        chars = [self._byte_encoder[b] for b in word.encode("utf-8")]
        if not chars:
            return []
        tokens = chars[:-1] + [chars[-1] + "</w>"]
        # iterative lowest-rank pair merge (standard BPE; merges every
        # occurrence of the chosen pair per round, as CLIP's bpe() does)
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
        unk = encoder.get("<|endoftext|>", 0)
        return [encoder.get(t, unk) for t in tokens]

    def _specials(self) -> dict[str, int]:
        """Literal strings mapped directly to an id, bypassing BPE — exactly
        the HF added-token behaviour the SD2-family tokenizer exhibits: with
        ``pad_token="!"`` registered as a special, a literal ``!`` anywhere in
        a prompt tokenizes to id 0, never to ``!</w>``."""
        if self._bpe is None:
            return {}
        enc = self._bpe["encoder"]
        sp = {"<|startoftext|>": self.bos, "<|endoftext|>": self.eos}
        if self.pad_token and self.pad_token in enc:
            sp[self.pad_token] = enc[self.pad_token]
        return sp

    def _encode_text(self, text: str) -> list[int]:
        text = _whitespace_clean(_basic_clean(text)).lower()
        specials = self._specials()
        ids: list[int] = []
        if specials:
            split_pat = re.compile(
                "|".join(re.escape(s) for s in sorted(specials, key=len, reverse=True))
            )
            pos = 0
            for m in split_pat.finditer(text):
                for word in self.PAT.findall(text[pos : m.start()]):
                    ids.extend(self._word_tokens(word))
                ids.append(specials[m.group()])
                pos = m.end()
            text = text[pos:]
        for word in self.PAT.findall(text):
            ids.extend(self._word_tokens(word))
        return ids

    def __call__(self, texts: str | list[str]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.max_len), np.int32)
        for r, text in enumerate(texts):
            ids = [self.bos] + self._encode_text(text)
            ids = ids[: self.max_len - 1] + [self.eos]
            out[r, : len(ids)] = ids
        return out
