"""ctypes bindings for the C++ native runtime (``libmathocr_native.so``).

The native library provides the host-side hot paths that sit outside the
XLA compute graph: bulk LaTeX tokenization/encoding, Levenshtein edit
distance for the eval harness, and the batch-assembly core of the data
loader. Every entry point has a pure-Python fallback at its call site, so
the framework works (slower) if the library has not been built.

Build:  ``python -m handwritten_math_ocr_api_tpu.native.build``
"""

from __future__ import annotations

import ctypes
import os

_LIB = None
_LIB_NAME = "libmathocr_native.so"


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.path.join(here, _LIB_NAME),
        os.path.join(here, "build", _LIB_NAME),
    ]
    for path in candidates:
        if os.path.exists(path):
            _LIB = ctypes.CDLL(path)
            break
    else:
        raise ImportError(f"{_LIB_NAME} not built; run python -m "
                          "handwritten_math_ocr_api_tpu.native.build")
    _LIB.mathocr_edit_distance.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
    ]
    _LIB.mathocr_edit_distance.restype = ctypes.c_int64
    return _LIB


def available() -> bool:
    try:
        _load()
        return True
    except ImportError:
        return False


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance over unicode codepoints (C++ fast path)."""
    lib = _load()
    ab = a.encode("utf-32-le")
    bb = b.encode("utf-32-le")
    return int(lib.mathocr_edit_distance(ab, len(a), bb, len(b)))
