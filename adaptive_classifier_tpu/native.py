"""ctypes bindings for the native C++ components (native/*.cpp).

First-party replacements for the reference's third-party native engines
(SURVEY.md §2.2): a WordPiece tokenizer (HF Rust-tokenizers analog, host hot
path) and a flat exact-L2 index (FAISS ``IndexFlatL2`` analog, host-side
verification oracle / CPU fallback).  The shared library is built on demand
with ``make`` and everything degrades gracefully to the pure-Python paths
when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libacnative.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True,
            capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as e:  # no toolchain / build failure → pure-Python path
        logger.debug(f"native build failed: {e}")
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and _NATIVE_DIR.exists():
        _build()
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        # tokenizer ABI
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int]
        lib.wp_free.argtypes = [ctypes.c_void_p]
        lib.wp_is_ascii.restype = ctypes.c_int
        lib.wp_is_ascii.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.wp_encode.restype = ctypes.c_int32
        lib.wp_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        # flat index ABI
        lib.fi_create.restype = ctypes.c_void_p
        lib.fi_create.argtypes = [ctypes.c_int64]
        lib.fi_free.argtypes = [ctypes.c_void_p]
        lib.fi_ntotal.restype = ctypes.c_int64
        lib.fi_ntotal.argtypes = [ctypes.c_void_p]
        lib.fi_add.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_float)]
        lib.fi_reset.argtypes = [ctypes.c_void_p]
        lib.fi_remove.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fi_search.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except OSError as e:
        logger.debug(f"native load failed: {e}")
    return _lib


class NativeWordPiece:
    """Native WordPiece encoder (ASCII fast path, exact vs the Python impl)."""

    def __init__(self, vocab: dict, do_lower_case: bool = True):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        tokens = [""] * (max(vocab.values()) + 1)
        for tok, idx in vocab.items():
            tokens[idx] = tok
        blob = "\n".join(tokens).encode("utf-8")
        self._handle = lib.wp_create(blob, len(blob), int(do_lower_case))

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.wp_free(self._handle)
            self._handle = None

    def is_ascii(self, text: str) -> bool:
        b = text.encode("utf-8", errors="ignore")
        return bool(self._lib.wp_is_ascii(b, len(b)))

    def encode(self, text: str, max_length: int) -> np.ndarray:
        if max_length < 2:
            raise ValueError(f"max_length must be >= 2 ([CLS]+[SEP]), got {max_length}")
        b = text.encode("utf-8", errors="ignore")
        out = np.zeros(max_length, np.int32)
        n = self._lib.wp_encode(
            self._handle, b, len(b),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_length,
        )
        return out[:n]

    def encode_batch(self, texts: List[str], max_length: int) -> Tuple[np.ndarray, np.ndarray]:
        if max_length < 2:
            raise ValueError(f"max_length must be >= 2 ([CLS]+[SEP]), got {max_length}")
        n = len(texts)
        bufs = [t.encode("utf-8", errors="ignore") for t in texts]
        arr = (ctypes.c_char_p * n)(*bufs)
        lens = np.asarray([len(b) for b in bufs], np.int64)
        out = np.zeros((n, max_length), np.int32)
        out_lens = np.zeros(n, np.int32)
        self._lib.wp_encode_batch(
            self._handle, arr, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_length,
        )
        return out, out_lens


class FlatIndexL2:
    """Host-side exact L2 index — FAISS ``IndexFlatL2`` API analog."""

    def __init__(self, dim: int):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.dim = dim
        self._handle = lib.fi_create(dim)

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.fi_free(self._handle)
            self._handle = None

    @property
    def ntotal(self) -> int:
        return int(self._lib.fi_ntotal(self._handle))

    def add(self, vecs: np.ndarray):
        vecs = np.ascontiguousarray(vecs, np.float32).reshape(-1, self.dim)
        self._lib.fi_add(self._handle, vecs.shape[0],
                         vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))

    def reset(self):
        self._lib.fi_reset(self._handle)

    def remove(self, row: int):
        self._lib.fi_remove(self._handle, row)

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.ascontiguousarray(queries, np.float32).reshape(-1, self.dim)
        nq = queries.shape[0]
        d = np.zeros((nq, k), np.float32)
        i = np.zeros((nq, k), np.int64)
        self._lib.fi_search(
            self._handle, nq,
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), k,
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return d, i


def native_available() -> bool:
    return load_native() is not None
