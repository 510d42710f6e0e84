"""Native (C++) stroke renderer: distribution parity with the Python
path, determinism, and speed (native/src/stroke_render.cpp).

The hard-regime flagship epochs were host-render-bound (~107 s Python
rendering vs ~76 s device loop on the 1-CPU host; VERDICT r4 weak #4).
The native backend keeps every layout decision and distribution-shaping
draw in Python (data/strokes.py display list) and moves per-point work
to C++. It is a *distribution* twin, not a bitwise twin — the RNG
streams differ — so parity is asserted statistically.
"""

import random

import numpy as np
import pytest

from handwritten_math_ocr_api_tpu import native
from handwritten_math_ocr_api_tpu.data.strokes import (
    StrokeStreamDataset,
    render_stroke_image,
    render_stroke_image_native,
)
from handwritten_math_ocr_api_tpu.data.synthetic import structured_formula

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

FORMULAS = [
    r"x ^ { 2 } + \frac { a } { b }",
    r"\sum _ { i = 1 } ^ { n } \sqrt { x _ { i } }",
    r"\lim _ { x \to \infty } \sin ( y ) - \alpha",
    r"\begin { pmatrix } a & b \ \ c & d \end { pmatrix }",
]


def _ink_stats(img):
    ink = img < 100
    ys, xs = np.where(ink)
    if len(ys) == 0:
        return 0.0, (0, 0)
    return float(ink.mean()), (int(ys.max() - ys.min()),
                               int(xs.max() - xs.min()))


@pytest.mark.parametrize("f", FORMULAS)
def test_native_matches_python_geometry(f):
    """Same formula, same seed: layout decisions are shared, so the ink
    bounding boxes and coverage must agree closely even though per-point
    RNG streams differ."""
    a = render_stroke_image(f, np.random.default_rng(3), 96, 320,
                            jitter=1.0)
    b = render_stroke_image_native(f, np.random.default_rng(3), 96, 320,
                                   jitter=1.0)
    fa, (ha, wa) = _ink_stats(a)
    fb, (hb, wb) = _ink_stats(b)
    assert fa > 0 and fb > 0
    assert 0.5 < fa / fb < 2.0, (fa, fb)
    assert abs(ha - hb) <= 12 and abs(wa - wb) <= 20, ((ha, wa), (hb, wb))


def test_native_overlap_same_seed():
    """With identical global params (same nrng consumption order) the two
    backends draw the same glyphs in the same places: dilated-mask overlap
    of the ink must be high."""
    f = FORMULAS[0]
    a = render_stroke_image(f, np.random.default_rng(11), 96, 320,
                            jitter=0.4)
    b = render_stroke_image_native(f, np.random.default_rng(11), 96, 320,
                                   jitter=0.4)

    def dilate(m, r=2):
        out = m.copy()
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                out |= np.roll(np.roll(m, dy, 0), dx, 1)
        return out

    ia, ib = a < 100, b < 100
    inter_a = (ia & dilate(ib)).sum() / max(ia.sum(), 1)
    inter_b = (ib & dilate(ia)).sum() / max(ib.sum(), 1)
    assert inter_a > 0.7 and inter_b > 0.7, (inter_a, inter_b)


def test_native_deterministic():
    f = FORMULAS[1]
    a = render_stroke_image_native(f, np.random.default_rng(5), 96, 320,
                                   degrade=0.6)
    b = render_stroke_image_native(f, np.random.default_rng(5), 96, 320,
                                   degrade=0.6)
    np.testing.assert_array_equal(a, b)


def test_native_degrade_distribution():
    """Degraded renders stay in a sane ink/contrast regime across many
    samples (blur, contrast collapse, pen skips all exercised)."""
    rng = random.Random(0)
    fs = [structured_formula(rng, 8, 3, rich=True, envs=True)
          for _ in range(40)]
    fs = [f for f in fs if len(f.split()) <= 60][:25]
    nrng = np.random.default_rng(9)
    fracs = []
    for f in fs:
        img = render_stroke_image_native(f, nrng, 96, 320, degrade=0.6)
        assert img.shape == (96, 320) and img.dtype == np.uint8
        fracs.append((img < 128).mean())
    assert 0.005 < np.mean(fracs) < 0.5


def test_native_empty_formula_blank():
    img = render_stroke_image_native("", np.random.default_rng(1), 96, 320)
    assert img.shape == (96, 320)
    assert (img > 150).mean() > 0.9  # mostly paper


def test_stream_dataset_native_flag():
    class _Tok:
        unk_id = 3

        def encode(self, f, max_len=None):
            ids = [1] + [5] * len(f.split()) + [2]
            if max_len is not None:
                ids = (ids + [0] * max_len)[:max_len]
            return ids

    ds = StrokeStreamDataset(_Tok(), 8, 96, 320, 64, seed=3, rich=True,
                             max_terms=8, depth=3, max_tokens=60,
                             degrade=0.6, native=True)
    img, ids, length = ds[0]
    assert img.shape == (96, 320) and img.dtype == np.uint8
    assert (img < 128).any()


def test_native_faster_than_python():
    """The point of the backend: meaningfully faster than Python on the
    same formulas (generous 2x bound to stay robust under CI noise;
    measured ~6x on the 1-CPU host)."""
    import time

    rng = random.Random(2)
    fs = [structured_formula(rng, 8, 3, rich=True) for _ in range(60)]
    fs = [f for f in fs if len(f.split()) <= 60][:30]
    nrng = np.random.default_rng(1)
    render_stroke_image_native(fs[0], nrng)  # warm registration
    t0 = time.perf_counter()
    for f in fs:
        render_stroke_image(f, nrng, 96, 320, degrade=0.6)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for f in fs:
        render_stroke_image_native(f, nrng, 96, 320, degrade=0.6)
    t_cc = time.perf_counter() - t0
    assert t_cc < t_py / 2.0, (t_py, t_cc)
