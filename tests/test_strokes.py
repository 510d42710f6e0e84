"""Stroke-based handwriting renderer tests (data/strokes.py).

The renderer is the MathWriting-difficulty stand-in: structural 2D layout
(raised superscripts, stacked fractions, radicals, under/over big-operator
scripts) drawn as jittered polyline strokes through the InkML
rasterization path — NOT the literal typeset LaTeX source that
synthetic.render_corpus_image draws (reference regime:
/root/reference/README.md:55-61)."""

import random

import numpy as np
import pytest

from handwritten_math_ocr_api_tpu.data.strokes import (
    GLYPHS, StrokeStreamDataset, _WORD_TOKENS, formula_strokes,
    make_stroke_corpus, render_stroke_image, stroke_vocab,
)
from handwritten_math_ocr_api_tpu.data.synthetic import (
    grammar_vocab, structured_formula,
)


def test_every_grammar_token_renderable():
    """Every token the formula grammar can emit has ink: a glyph template,
    a word expansion, or a structural layout role."""
    structural = {"{", "}", "^", "_", r"\frac", r"\sqrt"}
    for tok in grammar_vocab():
        if tok.startswith("<"):
            continue
        assert (tok in GLYPHS or tok in _WORD_TOKENS
                or tok in structural), tok


def test_stroke_vocab_matches_grammar():
    assert stroke_vocab() == grammar_vocab()


def test_parser_handles_any_grammar_sample():
    """500 random grammar samples must lay out without error and produce
    ink for every sample."""
    prng = random.Random(0)
    for i in range(500):
        f = structured_formula(prng)
        strokes = formula_strokes(f, random.Random(i))
        assert strokes, f
        total = sum(len(s) for s in strokes)
        assert total >= 3, f


def test_render_produces_ink_and_contrast():
    rng = np.random.default_rng(0)
    img = render_stroke_image(r"x ^ { 2 } + \frac { a } { b }", rng)
    assert img.shape == (96, 320) and img.dtype == np.uint8
    ink_frac = float((img < 128).mean())
    assert 0.002 < ink_frac < 0.5
    assert img.max() > 180  # light paper present


def test_structural_layout_differs_from_literal():
    """'x ^ { 2 }' must NOT contain ink for the brace/caret tokens: the
    superscript render uses strictly fewer ink columns than a literal
    5-glyph render of the source would."""
    prng = random.Random(1)
    sup = formula_strokes("x ^ { 2 }", prng, jitter=0.0)
    lit = formula_strokes("x + a - 2", prng, jitter=0.0)  # 5 glyphs wide
    w_sup = max(p[:, 0].max() for p in sup) - min(p[:, 0].min()
                                                  for p in sup)
    w_lit = max(p[:, 0].max() for p in lit) - min(p[:, 0].min()
                                                  for p in lit)
    assert w_sup < 0.6 * w_lit
    # and the superscript sits above the base glyph's vertical span
    x_strokes = formula_strokes("x", prng, jitter=0.0)
    x_top = min(p[:, 1].min() for p in x_strokes)
    sup_top = min(p[:, 1].min() for p in sup)
    assert sup_top < x_top - 0.2


def test_fraction_stacks_vertically():
    prng = random.Random(2)
    frac = formula_strokes(r"\frac { a } { b }", prng, jitter=0.0)
    ys = np.concatenate([p[:, 1] for p in frac])
    xs = np.concatenate([p[:, 0] for p in frac])
    # taller than wide-ish: vertical extent must exceed one glyph height
    assert ys.max() - ys.min() > 1.2
    assert xs.max() - xs.min() < 1.5


def test_stream_dataset_deterministic_and_labelled():
    vocab = grammar_vocab()
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer

    tok = Tokenizer(vocab)
    ds = StrokeStreamDataset(tok, samples_per_epoch=8, seed=3)
    img1, ids1, n1 = ds[0]
    img2, ids2, n2 = ds[0]
    np.testing.assert_array_equal(img1, img2)  # same idx -> same pixels
    np.testing.assert_array_equal(ids1, ids2)
    assert n1 == n2 and n1 >= 3
    assert img1.dtype == np.uint8 and img1.shape == (96, 320)
    # label round-trips through the tokenizer
    decoded = tok.decode(ids1)
    assert decoded == ds.formula_at(0)
    # epoch advance changes the sample; freeze pins it
    ds.set_epoch(1)
    img3, _, _ = ds[0]
    assert not np.array_equal(img1, img3)


def test_make_stroke_corpus_contract(tmp_path):
    root = str(tmp_path)
    make_stroke_corpus(root, n_train=4, n_val=2, n_test=2)
    import os

    import pandas as pd

    for split, n in (("train", 4), ("validate", 2), ("test", 2)):
        df = pd.read_csv(os.path.join(root, f"{split}_labels.csv"))
        assert list(df.columns) == ["image_filename", "latex_label"]
        assert len(df) == n
        for fn in df["image_filename"]:
            assert os.path.exists(
                os.path.join(root, f"{split}_formulas", fn))


@pytest.mark.parametrize("tok", [r"\sum", r"\int", r"\sqrt", "(", ")"])
def test_special_glyphs_have_ink(tok):
    prng = random.Random(0)
    f = {r"\sqrt": r"\sqrt { x }"}.get(tok, tok)
    strokes = formula_strokes(f, prng, jitter=0.0)
    assert sum(len(s) for s in strokes) >= 4


# ---------------------------------------------------------------------------
# MathWriting-difficulty ("rich") regime (VERDICT r3 item 2)
# ---------------------------------------------------------------------------

def test_every_rich_grammar_token_renderable():
    """The extended inventory (uppercase, full greek, set ops, brackets,
    primes, \\prod, \\lim) must also be fully renderable."""
    structural = {"{", "}", "^", "_", r"\frac", r"\sqrt", r"\lim"}
    for tok in grammar_vocab(rich=True):
        if tok.startswith("<"):
            continue
        assert (tok in GLYPHS or tok in _WORD_TOKENS
                or tok in structural), tok


def test_rich_vocab_strictly_larger():
    base, rich = grammar_vocab(), grammar_vocab(rich=True)
    assert set(base) <= set(rich)
    assert len(rich) >= len(base) + 60  # ~MathWriting symbol breadth


def test_rich_parser_handles_any_sample_and_renders_ink():
    rng = random.Random(3)
    nrng = np.random.default_rng(3)
    for _ in range(200):
        f = structured_formula(rng, max_terms=8, depth=3, rich=True)
        strokes = formula_strokes(f, rng)
        assert strokes, f
        img = render_stroke_image(f, nrng, degrade=0.6)
        assert img.shape == (96, 320)
        # ink present even under degradation (contrast collapse makes it
        # faint by design, but it must stay well separated from paper)
        assert int(img.min()) < int(img.max()) - 60, f


def test_rich_formulas_are_longer_and_use_extended_tokens():
    rng = random.Random(11)
    base_v = set(grammar_vocab())
    toks = []
    for _ in range(300):
        toks += structured_formula(rng, max_terms=8, depth=3,
                                   rich=True).split()
    extended_used = {t for t in toks if t not in base_v}
    assert len(extended_used) >= 25, sorted(extended_used)
    # length distribution reaches well past the base cap of 28
    rng2 = random.Random(12)
    lens = [len(structured_formula(rng2, max_terms=8, depth=3,
                                   rich=True).split())
            for _ in range(300)]
    assert max(lens) > 60
    assert np.mean(lens) > 18


def test_degrade_increases_difficulty_signals():
    """degrade > 0 must actually change the pixels (denser layout, blur,
    noise) while keeping the render deterministic per rng state."""
    f = r"\frac { a } { b } + \sqrt { x ^ { 2 } } = \Delta"
    img_a = render_stroke_image(f, np.random.default_rng(5), degrade=0.0)
    img_b = render_stroke_image(f, np.random.default_rng(5), degrade=1.0)
    assert img_a.shape == img_b.shape
    assert not np.array_equal(img_a, img_b)
    img_b2 = render_stroke_image(f, np.random.default_rng(5), degrade=1.0)
    np.testing.assert_array_equal(img_b, img_b2)


def test_rich_stream_dataset_roundtrip():
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer

    tok = Tokenizer(stroke_vocab(rich=True))
    ds = StrokeStreamDataset(tok, 8, max_tokens=60, rich=True,
                             max_terms=8, depth=3, degrade=0.5)
    img, ids, length = ds[0]
    assert img.shape == (96, 320) and ids.dtype == np.int32
    # no <unk> in the encoding: the rich vocab covers the rich grammar
    assert 3 not in ids[:length + 1]
