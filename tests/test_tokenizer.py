"""CLIP BPE tokenizer: golden-tested against transformers.CLIPTokenizer on
a synthetic vocab/merges pair (the real artifacts ship inside the weights
directories the reference downloads — tokenizer layout is identical)."""

import json

import numpy as np
import pytest

from text2nerf_tpu.models.tokenizer import CLIPBPETokenizer, bytes_to_unicode


def _tiny_vocab_files(tmp_path, pad_token=None):
    """A miniature CLIP-style vocab: printable-ASCII byte units, their
    </w> forms, a few merges, and the special tokens — under 256 ids so
    tiny text towers can consume the ids directly."""
    b2u = bytes_to_unicode()
    units = [b2u[b] for b in range(33, 127)]  # printable ASCII sans space
    merges = [
        ("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o</w>"),
        ("w", "o"), ("wo", "r"), ("wor", "l"), ("worl", "d</w>"),
        ("t", "h"), ("th", "e</w>"),
        ("c", "a"), ("ca", "t</w>"),
    ]
    vocab = {}
    for u in units:
        vocab[u] = len(vocab)
    for u in units:
        vocab[u + "</w>"] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    if pad_token is not None:
        (tmp_path / "tokenizer_config.json").write_text(
            json.dumps({"pad_token": pad_token})
        )
    return vocab, merges


PROMPTS = [
    "hello world",
    "Hello,   WORLD!!",
    "the cat sat on the hello mat",
    "a photo of a cat; 4k, trending",
    "hello " * 30,  # forces truncation
    "punctuation-only:  ?!...",
]


def test_bpe_matches_transformers(tmp_path):
    _tiny_vocab_files(tmp_path)
    from transformers import CLIPTokenizer

    hf = CLIPTokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    )
    ours = CLIPBPETokenizer.from_dir(str(tmp_path))
    assert ours is not None

    for prompt in PROMPTS:
        expect = hf(
            prompt, padding="max_length", truncation=True, max_length=32
        )["input_ids"]
        got = ours([prompt], context_length=32)[0]
        assert got.tolist() == expect, (prompt, got.tolist(), expect)


def test_bpe_batch_shape_and_specials(tmp_path):
    vocab, _ = _tiny_vocab_files(tmp_path)
    tok = CLIPBPETokenizer.from_dir(str(tmp_path))
    out = tok(["hello world", ""], context_length=16)
    assert out.shape == (2, 16) and out.dtype == np.int32
    assert out[0, 0] == vocab["<|startoftext|>"]
    assert vocab["<|endoftext|>"] in out[0]
    # empty prompt → BOS EOS then padding
    assert out[1, 0] == vocab["<|startoftext|>"]
    assert out[1, 1] == vocab["<|endoftext|>"]
    # EOT has the highest id so argmax pooling finds it
    assert int(out[0].argmax()) == int(np.where(
        out[0] == vocab["<|endoftext|>"])[0][0])


def test_pad_token_from_tokenizer_config(tmp_path):
    """SD2 checkpoints declare pad_token='!' — ids after EOS must be the
    '!' id, matching the HF tokenizer's padding."""
    vocab, _ = _tiny_vocab_files(tmp_path, pad_token="!")
    from transformers import CLIPTokenizer

    hf = CLIPTokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"),
        pad_token="!",
    )
    ours = CLIPBPETokenizer.from_dir(str(tmp_path))
    assert ours.pad_id == vocab["!"]
    expect = hf("hello", padding="max_length", truncation=True,
                max_length=12)["input_ids"]
    got = ours(["hello"], context_length=12)[0]
    assert got.tolist() == expect


def test_missing_files_returns_none(tmp_path):
    assert CLIPBPETokenizer.from_dir(str(tmp_path)) is None


def test_literal_special_tokens_map_to_single_ids(tmp_path):
    """A literal '<|endoftext|>' in the prompt must encode to its single
    vocab id (HF pre-seeds the BPE cache; ADVICE r2), not byte pieces."""
    _tiny_vocab_files(tmp_path)
    from transformers import CLIPTokenizer

    hf = CLIPTokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    )
    ours = CLIPBPETokenizer.from_dir(str(tmp_path))
    for prompt in ["hello <|endoftext|> world", "<|startoftext|>the cat"]:
        expect = hf(
            prompt, padding="max_length", truncation=True, max_length=32
        )["input_ids"]
        got = ours([prompt], context_length=32)[0]
        assert got.tolist() == expect, (prompt, got.tolist(), expect)
    assert ours.encode("<|endoftext|>") == [ours.eos_id]
