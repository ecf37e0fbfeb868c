"""Native C++ components vs their Python oracles."""

import json

import numpy as np
import pytest

from powerpaint_tpu.tasks import native as img_native
from powerpaint_tpu.tasks.postprocess import gaussian_blur as py_blur
from powerpaint_tpu.text import native as bpe_native
from powerpaint_tpu.text.tokenizer import ClipBPETokenizer, bytes_to_unicode

needs_native = pytest.mark.skipif(
    not (img_native.native_available() and bpe_native.native_available()),
    reason="native libs not built (run native/build.sh)",
)


def _synthetic_vocab(tmp_path):
    b2u = bytes_to_unicode()
    chars = [b2u[ord(c)] for c in "abcdehlorstw"]
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    for merged in ["he", "lo</w>", "llo</w>", "hello</w>", "cat</w>",
                   "at</w>", "wo", "wor", "worl", "world</w>"]:
        vocab[merged] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    merges = [("h", "e"), ("l", "o</w>"), ("l", "lo</w>"), ("he", "llo</w>"),
              ("a", "t</w>"), ("c", "at</w>"), ("w", "o"), ("wo", "r"),
              ("wor", "l"), ("worl", "d</w>")]
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges)
    )
    return str(tmp_path)


@needs_native
def test_native_bpe_matches_python(tmp_path):
    d = _synthetic_vocab(tmp_path)
    py = ClipBPETokenizer.from_dir(d)
    cc = bpe_native.NativeBPETokenizer.from_dir(d)
    for text in ["hello world", "Hello  CAT", "a b c hello", "cat cat cat",
                 "abc, hello! world."]:
        assert cc.encode_text(text) == py.encode_text(text), text
    assert cc.decode_ids(cc.encode_text("hello cat")) == "hello cat"


@needs_native
def test_native_blur_matches_numpy():
    rng = np.random.RandomState(0)
    mask = rng.rand(64, 80).astype(np.float32)
    a = py_blur(mask, 4.0)
    b = img_native.gaussian_blur(mask, 4.0)
    np.testing.assert_allclose(a, b, atol=1e-4)


@needs_native
def test_native_blend_and_overlay():
    rng = np.random.RandomState(0)
    res = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    orig = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0

    out = img_native.blend_result(res, orig, mask, blur_radius=0.0)
    np.testing.assert_array_equal(out[0, 0], orig[0, 0])
    np.testing.assert_array_equal(out[16, 16], res[16, 16])

    ov = img_native.red_overlay(orig, mask)
    assert ov[16, 16, 0] >= orig[16, 16, 0] // 2
    np.testing.assert_array_equal(ov[0, 0], orig[0, 0])
