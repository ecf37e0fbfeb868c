"""HF-oracle parity for the CLIP BPE tokenizer (Python AND C++ paths).

The reference tokenizes through transformers' slow ``CLIPTokenizer``
(/root/reference/powerpaint/utils/utils.py:92-117, app.py:94); wrong token
ids would silently poison every generation once real weights are loaded.
These tests pin ``ClipBPETokenizer`` / ``NativeBPETokenizer`` against the
installed transformers implementation on a byte-complete synthetic vocab —
no network, no checkpoint needed.  Segmentation, normalization (the
non-ftfy BasicTokenizer path this container exercises), merge-round
semantics, unknown handling, and special-literal handling are all covered.
"""

import json

import pytest
from transformers import CLIPTokenizer

from powerpaint_tpu.text.native import NativeBPETokenizer, native_available
from powerpaint_tpu.text.tokenizer import (
    ClipBPETokenizer,
    TokenizerWrapper,
    bytes_to_unicode,
)

# handcrafted merge list: every pair references symbols that exist at that
# point; merge results are appended to the vocab in order (CLIP layout).
# Includes multi-round chains (a->aa->aaaa), a rank-interaction case
# ((b,c) rank < (a,bc) — exercises all-occurrences-per-round semantics on
# words like "abcbc"), contractions, and a multi-byte UTF-8 merge (é).
_E_ACUTE = "é".encode("utf-8")  # 0xC3 0xA9
_MERGES = [
    ("t", "h"), ("th", "e</w>"), ("a", "n"), ("an", "d</w>"),
    ("i", "n"), ("in", "g</w>"), ("e", "r</w>"), ("r", "e"),
    ("a", "t</w>"), ("c", "at</w>"), ("h", "e"), ("l", "l"),
    ("ll", "o</w>"), ("he", "llo</w>"), ("w", "o"), ("wo", "r"),
    ("wor", "l"), ("worl", "d</w>"),
    ("a", "a"), ("aa", "aa"), ("aaaa", "aaaa"),
    ("b", "c"), ("a", "bc"), ("bc", "bc"),
    ("'", "s</w>"), ("l", "l</w>"), ("'", "ll</w>"),
    ("o", "n</w>"), ("i", "s</w>"), ("o", "f</w>"),
]


def build_synthetic_clip_files(tmp_path):
    """Byte-complete CLIP-layout vocab: 256 byte units, 256 unit+'</w>',
    merge results in rank order, then the two specials (real CLIP's exact
    structural layout, tiny merge table)."""
    b2u = bytes_to_unicode()
    units = [b2u[b] for b in range(256)]
    vocab = {}
    for u in units:
        vocab[u] = len(vocab)
    for u in units:
        vocab[u + "</w>"] = len(vocab)
    merges = list(_MERGES)
    # multi-byte UTF-8 word char merge: 0xC3 0xA9 -> é symbol-pair
    merges.append((b2u[_E_ACUTE[0]], b2u[_E_ACUTE[1]] + "</w>"))
    for a, b in merges:
        tok = a + b
        assert a in vocab and b in vocab, (a, b)
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(vocab), encoding="utf-8")
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8",
    )
    return str(vocab_file), str(merges_file), vocab


# >=50 adversarial strings: underscores, digit runs, unicode punctuation,
# accents/NFC, CJK, mixed scripts, special literals, contractions,
# whitespace zoo, control chars, emoji, deep-merge words.
ADVERSARIAL = [
    "hello world",
    "a_b under_score _leading trailing_",
    "__dunder__",
    "1234567890",
    "v1.5 model, 512x512!",
    "the cat and the hat",
    "aaaaaaaa aaa aaaaaaaaa",
    "abcbc abcbcbc bcbc",
    "it's we'll don't can't I'd you're we've I'm",
    "IT'S WE'LL SHOUTING",
    "café naïve résumé",
    "café (decomposed NFC test)",
    "ｆｕｌｌｗｉｄｔｈ",
    "汉字 漢字",
    "日本語テスト",
    "한국어",
    "Ⅻ roman ² superscript ½ fraction",
    "٣ arabic-indic ३ devanagari",
    "привет мир",
    "γειά σου κόσμε",
    "مرحبا بالعالم",
    "em—dash – en … ellipsis",
    "“smart quotes” ‘single’ „low”",
    "<|endoftext|>",
    "text <|endoftext|> more",
    "<|startoftext|>start",
    "<|ENDOFTEXT|> upper literal",
    "a<|endoftext|>b",
    "!!!???...,,,;;;:::",
    "(parens) [brackets] {braces}",
    "http://example.com/path?q=1&b=2",
    "user@example.com",
    "50% off $100 €50 £20 ¥500",
    "#hashtag @mention",
    "tab\tnewline\ncarriage\rmix",
    "  leading and trailing  ",
    "nbsp char",
    "zero\u200bwidth \u200djoiner",
    "bell\x07control\x00null",
    "line\u2028sep\u2029para separators",
    "İstanbul STRASSE ß",
    "MiXeD CaSe WoRdS",
    "emoji 😀 🎨 test",
    "skin 👍🏽 tone",
    "combining à́̂ marks",
    "ligature ﬁ ﬂ",
    "math ∑∫√ ≤≥≠",
    "arrows →←↑↓",
    "box ░▒▓ drawing",
    "'s 'll bare contractions",
    "trailing apostrophe' 'leading",
    "a'b'c d''e",
    "hyphen-ated co-op re-use",
    "under_score-hyphen.dot,comma",
    "",
    " ",
    "\t\n",
    "x",
    "é",
    "worldworldworld",
    "the quick brown fox jumps over the lazy dog 0123456789 times!",
]


@pytest.fixture(scope="module")
def oracle_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clip_vocab")
    vocab_file, merges_file, vocab = build_synthetic_clip_files(tmp)
    hf = CLIPTokenizer(vocab_file=vocab_file, merges_file=merges_file)
    ours = ClipBPETokenizer.from_dir(str(tmp))
    return hf, ours, str(tmp), vocab


def test_python_bpe_matches_hf_oracle(oracle_setup):
    hf, ours, _, _ = oracle_setup
    for text in ADVERSARIAL:
        expected = hf.encode(text)
        got = [ours.bos_id] + ours.encode_text(text) + [ours.eos_id]
        assert got == expected, f"python BPE diverges on {text!r}"


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_bpe_matches_hf_oracle(oracle_setup):
    hf, _, tmpdir, _ = oracle_setup
    native = NativeBPETokenizer.from_dir(tmpdir)
    for text in ADVERSARIAL:
        expected = hf.encode(text)
        got = [native.bos_id] + native.encode_text(text) + [native.eos_id]
        assert got == expected, f"native BPE diverges on {text!r}"


def test_wrapper_padding_matches_hf(oracle_setup):
    """bos + ids + eos, eos-padded to 77, truncation — full batch contract."""
    hf, ours, _, _ = oracle_setup
    wrapper = TokenizerWrapper(ours, max_length=77)
    texts = ["hello world", "the cat", "worldworldworld " * 30, ""]
    expected = hf(
        texts, padding="max_length", max_length=77, truncation=True
    ).input_ids
    got = wrapper(texts)
    assert got.tolist() == expected


def test_segmentation_keeps_underscore(oracle_setup):
    """Regression: the old stdlib-re pattern dropped '_' entirely."""
    _, ours, _, vocab = oracle_setup
    ids = ours.encode_text("_")
    assert ids == [vocab["_</w>"]]
