"""ctypes bindings for the C++ native runtime (``libmathocr_native.so``).

The native library provides host-side hot paths that sit outside the XLA
compute graph: the LaTeX token scanner (bulk corpus encoding), Levenshtein
edit distance (single + parallel batched, eval harness), and parallel
batch assembly for the data loader. Every entry point has a pure-Python
fallback at its call site, so the framework works (slower) when the
library has not been built.

Build:  ``python -m handwritten_math_ocr_api_tpu.native.build``
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Sequence

import numpy as np

_LIB = None
_LIB_NAME = "libmathocr_native.so"
_SEP = "\x1f"


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, _LIB_NAME)
    if not os.path.exists(path):
        # opportunistic build: toolchain is available in the image
        try:
            from .build import build

            build(quiet=True)
        except Exception:
            pass
    if not os.path.exists(path):
        raise ImportError(
            f"{_LIB_NAME} not built; run "
            "python -m handwritten_math_ocr_api_tpu.native.build")
    lib = ctypes.CDLL(path)
    lib.mathocr_edit_distance.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t]
    lib.mathocr_edit_distance.restype = ctypes.c_int64
    lib.mathocr_tokenize.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t]
    lib.mathocr_tokenize.restype = ctypes.c_int64
    lib.mathocr_assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_int]
    lib.mathocr_assemble_batch.restype = None
    lib.mathocr_edit_distance_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_size_t, ctypes.c_void_p, ctypes.c_int]
    lib.mathocr_edit_distance_batch.restype = None
    lib.mathocr_version.restype = ctypes.c_char_p
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except ImportError:
        return False


def version() -> str:
    return _load().mathocr_version().decode()


def edit_distance(a: str, b: str) -> int:
    """Levenshtein over unicode codepoints (C++ fast path)."""
    lib = _load()
    ab = a.encode("utf-32-le")
    bb = b.encode("utf-32-le")
    return int(lib.mathocr_edit_distance(ab, len(a), bb, len(b)))


def edit_distance_batch(preds: Sequence[str], targets: Sequence[str],
                        num_threads: int = 4) -> np.ndarray:
    """Parallel per-pair Levenshtein distances."""
    lib = _load()
    n = len(preds)
    assert len(targets) == n

    def pack(strs):
        offs = np.zeros(n + 1, np.int64)
        for i, s in enumerate(strs):
            offs[i + 1] = offs[i] + len(s)
        buf = np.frombuffer(
            ("".join(strs)).encode("utf-32-le"), dtype=np.uint32
        ).copy() if n else np.zeros(0, np.uint32)
        return buf, offs

    a_buf, a_off = pack(list(preds))
    b_buf, b_off = pack(list(targets))
    out = np.zeros(n, np.int64)
    lib.mathocr_edit_distance_batch(
        a_buf.ctypes.data, a_off.ctypes.data,
        b_buf.ctypes.data, b_off.ctypes.data,
        n, out.ctypes.data, num_threads)
    return out


def tokenize(formula: str, max_bytes: int = 1 << 16) -> List[str]:
    """LaTeX tokenization with the reference regex semantics."""
    lib = _load()
    raw = formula.encode("utf-8")
    buf = ctypes.create_string_buffer(max(max_bytes, 2 * len(raw) + 16))
    n = lib.mathocr_tokenize(raw, len(raw), buf, len(buf))
    if n < 0:
        raise ValueError("tokenize output buffer too small")
    if n == 0:
        return []
    return buf.value.decode("utf-8").split(_SEP)


def assemble_batch(images: Sequence[np.ndarray],
                   num_threads: int = 4) -> np.ndarray:
    """Stack N equal-shape uint8 (H, W) images into (N, H, W, 1) with a
    C++ thread pool."""
    lib = _load()
    n = len(images)
    h, w = images[0].shape
    out = np.empty((n, h, w, 1), np.uint8)
    contig = [np.ascontiguousarray(im) for im in images]
    ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data for im in contig])
    lib.mathocr_assemble_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)), n, h * w,
        out.ctypes.data, num_threads)
    return out
