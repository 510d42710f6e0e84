"""Native C++ library tests: build, then assert parity with the Python
reference implementations (tokenizer regex semantics, Levenshtein)."""

import random

import numpy as np
import pytest

from handwritten_math_ocr_api_tpu.core.tokenizer import tokenize_latex
from handwritten_math_ocr_api_tpu.eval.metrics import _levenshtein_py


@pytest.fixture(scope="module")
def native():
    from handwritten_math_ocr_api_tpu.native.build import build

    build(quiet=True)
    from handwritten_math_ocr_api_tpu import native as n

    assert n.available()
    return n


def test_version(native):
    assert "mathocr-native" in native.version()


def test_edit_distance_parity(native):
    cases = [("", ""), ("a", ""), ("kitten", "sitting"),
             ("\\frac{x}{2}", "\\frac{y}{2}"), ("αβγ", "αγ")]
    for a, b in cases:
        assert native.edit_distance(a, b) == _levenshtein_py(a, b)


def test_edit_distance_batch_parity(native):
    rng = random.Random(0)
    alphabet = "ab\\{}^_0123456789 αβ"
    preds = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
             for _ in range(50)]
    tgts = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
            for _ in range(50)]
    got = native.edit_distance_batch(preds, tgts)
    want = [_levenshtein_py(a, b) for a, b in zip(preds, tgts)]
    assert list(got) == want


def test_tokenize_parity(native):
    cases = [
        r"\frac{x^2}{2}",
        "123 + abc",
        r"\alpha_1^{23}",
        r"a \% b & c # d $ e",
        r"\begin{matrix} x \\ y \end{matrix}",
        "x±y × ∫ f",  # unicode single-char tokens
        "",
        "   ",
        r"\\",  # backslash not followed by letters -> two single tokens
    ]
    for s in cases:
        assert native.tokenize(s) == tokenize_latex(s), s


def test_tokenize_random_fuzz(native):
    rng = random.Random(1)
    alphabet = r"ab9\frac{}^_ $%&#+-=×α "
    for _ in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        assert native.tokenize(s) == tokenize_latex(s), repr(s)


def test_assemble_batch(native):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (96, 320), np.uint8) for _ in range(7)]
    out = native.assemble_batch(imgs)
    assert out.shape == (7, 96, 320, 1)
    for i in range(7):
        np.testing.assert_array_equal(out[i, :, :, 0], imgs[i])
