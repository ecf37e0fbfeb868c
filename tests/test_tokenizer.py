"""Tokenizer wrapper: placeholder expansion, contiguous ids, round-trip."""

import numpy as np
import pytest

from powerpaint_tpu.text.tokenizer import (
    ClipBPETokenizer,
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)
from powerpaint_tpu.text.prompts import add_task, v2_prompt_suffix


@pytest.fixture
def tok():
    t = TokenizerWrapper(HashTokenizer())
    add_task_tokens(t)
    return t


def test_placeholder_registration_contiguous(tok):
    info = tok.get_token_info("P_ctxt")
    assert info["start"] == 49408 and info["end"] == 49418
    info = tok.get_token_info("P_shape")
    assert info["start"] == 49418 and info["end"] == 49428
    info = tok.get_token_info("P_obj")
    assert info["start"] == 49428 and info["end"] == 49438
    assert tok.num_external_tokens == 30


def test_expansion_inserts_ten_ids(tok):
    ids = tok("a cat P_obj")[0]
    # bos + 2 words + 10 placeholder ids + eos ... padded to 77
    assert ids.shape == (77,)
    ext = ids[(ids >= 49408)]
    assert list(ext) == list(range(49428, 49438))


def test_overlapping_placeholder_rejected(tok):
    with pytest.raises(ValueError):
        tok.add_placeholder_token("P_obj_extra", num_vec_per_token=2)


def test_decode_collapses_placeholders(tok):
    ids = tok("P_ctxt")[0]
    text = tok.decode(ids)
    assert "P_ctxt" in text
    assert "P_ctxt_0" not in text


def test_truncation_to_max_length(tok):
    long_prompt = " ".join(f"word{i}" for i in range(200))
    ids = tok(long_prompt)
    assert ids.shape == (1, 77)


def test_add_task_v1_strings():
    p = add_task("a cat", "ugly", "text-guided", "ppt-v1")
    assert p.promptA == "a cat P_obj"
    assert p.negative_promptA.startswith("ugly, worst quality")
    assert p.negative_promptA.endswith("P_obj")

    p = add_task("", "", "object-removal", "ppt-v1")
    assert p.promptA == "empty scene blur  P_ctxt"
    assert p.negative_promptA == " P_obj"

    p = add_task("a dog", "bad", "shape-guided", "ppt-v1")
    assert p.promptA == "a dog P_shape"
    assert p.promptB == "a dog P_ctxt"


def test_add_task_v2_strings():
    prompt = v2_prompt_suffix("a house", "image-outpainting")
    assert prompt == "a house empty scene"
    p = add_task(prompt, "", "image-outpainting", "ppt-v2")
    assert p.promptA == " P_ctxt"
    assert p.negative_promptA == " P_obj"
    assert p.promptU == "a house empty scene"


def test_clip_bpe_with_synthetic_vocab(tmp_path):
    """Exercise the real BPE algorithm on a tiny synthetic vocab."""
    import json

    from powerpaint_tpu.text.tokenizer import bytes_to_unicode

    b2u = bytes_to_unicode()
    # vocab: single chars + merged pairs + specials
    chars = [b2u[ord(c)] for c in "abcdehlotw"]
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    for merged in ["he", "lo</w>", "llo</w>", "hello</w>", "cat</w>", "at</w>"]:
        vocab[merged] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    merges = [("h", "e"), ("l", "o</w>"), ("l", "lo</w>"), ("he", "llo</w>"),
              ("a", "t</w>"), ("c", "at</w>")]

    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges)
    )
    bpe = ClipBPETokenizer.from_dir(str(tmp_path))
    ids = bpe.encode_text("hello cat")
    assert vocab["hello</w>"] in ids
    assert vocab["cat</w>"] in ids
    assert bpe.decode_ids(ids) == "hello cat"
