"""Token-id equality between SimpleTokenizer and transformers.CLIPTokenizer.

The reference's SD x4-upscaler prompt path tokenizes through the diffusers
pipeline's bundled HF CLIPTokenizer (reference ``st_app2.py:40-42``). The
published vocab files can't be downloaded here (zero egress), so the fixture
constructs a miniature-but-structurally-exact vocab locally — the real
``bytes_to_unicode`` alphabet, word-final ``</w>`` forms, a hand-built merge
table, and the two specials, in CLIP's exact vocab order — writes it in BOTH
public formats (HF ``vocab.json``+``merges.txt`` and the OpenAI
``bpe_simple_vocab_16e6.txt.gz`` merge list), and asserts id-for-id equality
against ``transformers.CLIPTokenizer`` loading the same files
(VERDICT r1 missing #3: the previous tokenizer used a placeholder ``chr(i)``
byte alphabet, so even real vocab files would have produced wrong ids).

Padding: the SD2-family tokenizer config (x4-upscaler included) sets
``pad_token="!"`` which is id 0 — identical to the zero-padding here and to
OpenAI CLIP's convention.
"""

import gzip
import json

import numpy as np
import pytest

from dgm_img_super_resolution_tpu.models.sd.clip import SimpleTokenizer, bytes_to_unicode

# merge table: each pair's parts must already exist (alphabet, </w> form, or
# earlier merge) — mirrors how trained BPE tables are ordered
MERGES = [
    ("a", "t</w>"),
    ("c", "at</w>"),
    ("h", "e"),
    ("h", "e</w>"),
    ("t", "he</w>"),
    ("i", "n"),
    ("in", "g</w>"),
    ("e", "r</w>"),
    ("r", "e"),
    ("re", "s"),
    ("o", "n</w>"),
    ("t", "i"),
    ("ti", "on</w>"),
    ("o", "f</w>"),
    ("a", "</w>"),
    ("p", "h"),
    ("ph", "o"),
    ("pho", "t"),
    ("phot", "o</w>"),
]

CORPUS = [
    "a cat",
    "The cat sat on the mat!",
    "a photo of a cat, high resolution",
    "super-resolution ×4 upscaling",
    "don't stop; won't stop",
    "café crème",  # multi-byte UTF-8 through bytes_to_unicode
    "whitespace\t\n   normalisation",
    "",
    "x" * 300,  # forces truncation to 77
    "wow!! a cat! <|endoftext|> after eos",  # pad/eos literals as added specials
]


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    base = list(bytes_to_unicode().values())
    vocab = base + [v + "</w>" for v in base]
    vocab += ["".join(m) for m in MERGES]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    vocab_json = d / "vocab.json"
    vocab_json.write_text(json.dumps({t: i for i, t in enumerate(vocab)}), encoding="utf-8")
    merge_lines = [" ".join(m) for m in MERGES]
    merges_txt = d / "merges.txt"
    merges_txt.write_text("#version: 0.2\n" + "\n".join(merge_lines) + "\n", encoding="utf-8")
    bpe_gz = d / "bpe_mini_vocab.txt.gz"
    with gzip.open(bpe_gz, "wt", encoding="utf-8") as f:
        f.write("bpe fixture header\n" + "\n".join(merge_lines) + "\n")
    return str(vocab_json), str(merges_txt), str(bpe_gz)


@pytest.fixture(scope="module")
def hf_ids(vocab_files):
    from transformers import CLIPTokenizer

    vocab_json, merges_txt, _ = vocab_files
    hf = CLIPTokenizer(vocab_json, merges_txt, pad_token="!")
    enc = hf(CORPUS, padding="max_length", max_length=77, truncation=True)
    return np.asarray(enc.input_ids, np.int32)


def test_hf_format_token_id_equality(vocab_files, hf_ids):
    vocab_json, merges_txt, _ = vocab_files
    tok = SimpleTokenizer(vocab_json=vocab_json, merges_txt=merges_txt)
    np.testing.assert_array_equal(tok(CORPUS), hf_ids)


def test_openai_gz_format_token_id_equality(vocab_files, hf_ids):
    """The OpenAI merge-list format must construct the identical vocab."""
    _, _, bpe_gz = vocab_files
    tok = SimpleTokenizer(bpe_path=bpe_gz)
    np.testing.assert_array_equal(tok(CORPUS), hf_ids)


def test_bytes_to_unicode_is_the_published_map():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert m[ord("!")] == "!" and m[ord("~")] == "~"  # printable identity
    assert m[0] == chr(256) and m[32] == chr(256 + 32)  # controls/space remapped
    assert all(not c.isspace() for c in m.values())


def test_fallback_without_files_keeps_contract():
    tok = SimpleTokenizer()
    ids = tok(["a cat", ""])
    assert ids.shape == (2, 77) and ids.dtype == np.int32
    assert ids[0, 0] == tok.bos and tok.eos in ids[0]
