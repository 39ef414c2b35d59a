"""ctypes binding for the native C++ WordPiece tokenizer (native/wordpiece.cc).

Drop-in accelerated replacement for models/tokenizer.py's encode path on the
host data pipeline. Falls back transparently to the pure-Python tokenizer if
the shared library hasn't been built (``make -C native``).
"""
from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

from candidate_reranking_cir_tpu.models.tokenizer import handle_overflow

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libwordpiece.so"


def _load_lib():
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.wp_load.restype = ctypes.c_void_p
    lib.wp_load.argtypes = [ctypes.c_char_p]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_vocab_size.restype = ctypes.c_int32
    lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
    lib.wp_special_id.restype = ctypes.c_int32
    lib.wp_special_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.wp_encode_batch.restype = ctypes.c_int32
    lib.wp_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    return lib


def native_available() -> bool:
    return _LIB_PATH.exists()


class NativeWordPieceTokenizer:
    """Same encode() contract as models.tokenizer.WordPieceTokenizer."""

    def __init__(self, vocab_path: str | Path):
        self.overflow = "error"
        self.overflow_count = 0
        if not native_available():
            raise FileNotFoundError(
                f"{_LIB_PATH} not built; run `make -C native`")
        self._lib = _load_lib()
        self._handle = self._lib.wp_load(str(vocab_path).encode())
        if not self._handle:
            raise FileNotFoundError(f"cannot load vocab {vocab_path}")
        self.vocab_size = self._lib.wp_vocab_size(self._handle)
        self.pad_id = self._special("[PAD]")
        self.cls_id = self._special("[CLS]")
        self.sep_id = self._special("[SEP]")
        self.unk_id = self._special("[UNK]")
        self.enc_token_id = self._special("[ENC]")
        self.dec_token_id = self._special("[DEC]")

    def _special(self, tok: str) -> int:
        return int(self._lib.wp_special_id(self._handle, tok.encode()))

    def encode(self, texts: list[str], max_len: int, *,
               set_enc_token: bool = False, overflow: str | None = None):
        policy = overflow if overflow is not None else self.overflow
        n = len(texts)
        ids = np.empty((n, max_len), np.int32)
        mask = np.empty((n, max_len), np.int32)
        stats = np.zeros(2, np.int32)  # {n_overflowed, worst_piece_count}
        arr = (ctypes.c_char_p * n)(*[t.encode("utf-8") for t in texts])
        self._lib.wp_encode_batch(
            self._handle, arr, n, max_len, int(set_enc_token),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            stats.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        handle_overflow(policy, int(stats[0]), n, int(stats[1]), max_len)
        self.overflow_count += int(stats[0])
        return ids, mask

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.wp_free(self._handle)
        except Exception:
            pass
