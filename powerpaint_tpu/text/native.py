"""ctypes binding for the native C++ CLIP BPE core (native/bpe_tokenizer.cpp).

``NativeBPETokenizer`` is API-compatible with ``ClipBPETokenizer``
(text/tokenizer.py) so ``TokenizerWrapper`` can sit on either; the Python
implementation stays as the portable fallback and the correctness oracle
(tests assert identical ids).
"""

from __future__ import annotations

import ctypes
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native",
                         "libppt_bpe.so")


def _load_lib() -> Optional[ctypes.CDLL]:
    try:
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    except OSError:
        return None
    lib.ppt_bpe_create.restype = ctypes.c_void_p
    lib.ppt_bpe_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.ppt_bpe_destroy.argtypes = [ctypes.c_void_p]
    lib.ppt_bpe_encode.restype = ctypes.c_int32
    lib.ppt_bpe_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    try:
        lib.ppt_bpe_encode_words.restype = ctypes.c_int32
        lib.ppt_bpe_encode_words.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
    except AttributeError:  # stale .so predating the word-level ABI
        return None
    return lib


_LIB = _load_lib()


def native_available() -> bool:
    return _LIB is not None


class NativeBPETokenizer:
    """CLIP BPE backed by the C++ core; same surface as ClipBPETokenizer."""

    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]]):
        if _LIB is None:
            raise RuntimeError(
                "native BPE library not built (run native/build.sh)"
            )
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in vocab.items()}
        self.bos_id = vocab.get("<|startoftext|>", 49406)
        self.eos_id = vocab.get("<|endoftext|>", 49407)

        ordered = sorted(vocab.items(), key=lambda kv: kv[1])
        assert [v for _, v in ordered] == list(range(len(ordered))), (
            "vocab ids must be dense 0..N-1"
        )
        vocab_blob = b"\x00".join(k.encode("utf-8") for k, _ in ordered) + b"\x00"
        merges_blob = b"\x00".join(
            f"{a} {b}".encode("utf-8") for a, b in merges
        ) + b"\x00"
        self._handle = _LIB.ppt_bpe_create(
            vocab_blob, len(vocab_blob), len(ordered),
            merges_blob, len(merges_blob), len(merges),
            self.bos_id, self.eos_id,
        )
        self._buf = (ctypes.c_int32 * 4096)()

    def __del__(self):
        if getattr(self, "_handle", None) and _LIB is not None:
            _LIB.ppt_bpe_destroy(self._handle)
            self._handle = None

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    @classmethod
    def from_dir(cls, path: str) -> "NativeBPETokenizer":
        with open(os.path.join(path, "vocab.json"), encoding="utf-8") as f:
            vocab = json.load(f)
        merges = []
        with open(os.path.join(path, "merges.txt"), encoding="utf-8") as f:
            for line in f.read().split("\n"):
                if not line or line.startswith("#version"):
                    continue
                parts = line.split()
                if len(parts) == 2:
                    merges.append((parts[0], parts[1]))
        return cls(vocab, merges)

    def encode_text(self, text: str) -> List[int]:
        # Normalization + word segmentation happen in Python (HF-identical,
        # needs unicode category tables — text/tokenizer.py::segment_words);
        # the hot per-word merge loop runs in C++.
        from powerpaint_tpu.text.tokenizer import segment_words

        words = segment_words(text)
        if not words:
            return []
        blob = b"\x00".join(w.encode("utf-8") for w in words) + b"\x00"
        n = _LIB.ppt_bpe_encode_words(
            self._handle, blob, len(words), len(self._buf), self._buf
        )
        return list(self._buf[:n])

    def decode_ids(self, ids: Sequence[int]) -> str:
        from powerpaint_tpu.text.tokenizer import bytes_to_unicode

        byte_decoder = {v: k for k, v in bytes_to_unicode().items()}
        text = "".join(self.decoder.get(int(i), "") for i in ids)
        buf = bytearray(byte_decoder[c] for c in text if c in byte_decoder)
        return (
            buf.decode("utf-8", errors="replace").replace("</w>", " ").strip()
        )
