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
    lib.mathocr_register_glyphs.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64]
    lib.mathocr_register_glyphs.restype = ctypes.c_int
    lib.mathocr_num_glyphs.restype = ctypes.c_int64
    lib.mathocr_render_formula.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.mathocr_render_formula.restype = ctypes.c_int
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


def register_glyphs(pts: np.ndarray, stroke_off: np.ndarray,
                    glyph_off: np.ndarray) -> int:
    """Register flattened glyph templates (once per process). ``pts``
    float32 (P, 2); ``stroke_off`` int64 (S+1,) point offsets;
    ``glyph_off`` int64 (G+1,) stroke offsets. Returns glyph count."""
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float32)
    stroke_off = np.ascontiguousarray(stroke_off, np.int64)
    glyph_off = np.ascontiguousarray(glyph_off, np.int64)
    rc = lib.mathocr_register_glyphs(
        pts.ctypes.data, stroke_off.ctypes.data, glyph_off.ctypes.data,
        len(stroke_off) - 1, len(glyph_off) - 1)
    if rc != 0:
        raise RuntimeError("mathocr_register_glyphs failed")
    return int(lib.mathocr_num_glyphs())


def render_formula(g_ids: np.ndarray, g_aff: np.ndarray,
                   g_seed: np.ndarray, g_width: np.ndarray,
                   in_pts: np.ndarray, in_off: np.ndarray,
                   drop_idx: np.ndarray, params: np.ndarray,
                   noise_seed: int, img_h: int, img_w: int) -> np.ndarray:
    """Render one display list to a uint8 (img_h, img_w) image (see
    native/src/stroke_render.cpp for the argument contract)."""
    lib = _load()
    g_ids = np.ascontiguousarray(g_ids, np.int32)
    g_aff = np.ascontiguousarray(g_aff, np.float64)
    g_seed = np.ascontiguousarray(g_seed, np.uint64)
    g_width = np.ascontiguousarray(g_width, np.float64)
    in_pts = np.ascontiguousarray(in_pts, np.float32)
    in_off = np.ascontiguousarray(in_off, np.int64)
    drop_idx = np.ascontiguousarray(drop_idx, np.int64)
    params = np.ascontiguousarray(params, np.float64)
    out = np.empty((img_h, img_w), np.uint8)
    rc = lib.mathocr_render_formula(
        g_ids.ctypes.data, g_aff.ctypes.data, g_seed.ctypes.data,
        g_width.ctypes.data, len(g_ids), in_pts.ctypes.data,
        in_off.ctypes.data, len(in_off) - 1, drop_idx.ctypes.data,
        len(drop_idx), params.ctypes.data,
        ctypes.c_uint64(noise_seed & (2 ** 64 - 1)), out.ctypes.data,
        img_h, img_w)
    if rc != 0:
        raise RuntimeError(f"mathocr_render_formula rc={rc}")
    return out


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
