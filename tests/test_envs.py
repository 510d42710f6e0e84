"""2-D LaTeX environment support: grammar, rendering, vocab extension.

Closes VERDICT r4 gap #2: real MathWriting contains ``\\begin{...}``
constructs and the reference tokenizer explicitly handles them
(reference: src/utils.py:96-99, app/src/utils.py:22-27), but the hard
grammar previously generated none — so the pushdown env machinery and the
begin/end validity checks were exercised only by unit fixtures. These
tests pin the env-bearing grammar (``envs=True``), its stroke rendering,
and the extend-vocab fine-tune path (train/vocab_extend.py).
"""

import random

import numpy as np
import pytest

import jax

from handwritten_math_ocr_api_tpu.core.config import ModelConfig, TrainConfig
from handwritten_math_ocr_api_tpu.core.tokenizer import (
    Tokenizer,
    tokenize_latex,
)
from handwritten_math_ocr_api_tpu.data.synthetic import (
    ENV_TOKENS,
    grammar_vocab,
    structured_formula,
)
from handwritten_math_ocr_api_tpu.data.strokes import (
    StrokeStreamDataset,
    render_stroke_image,
)
from handwritten_math_ocr_api_tpu.eval.latex_check import check_latex

TINY_MC = dict(d_model=32, nhead=4, num_decoder_layers=1,
               dim_feedforward=64, encoder="resnet18", max_seq_len=24)


def _hard_env_formula(seed=0, want_env=True):
    rng = random.Random(seed)
    for _ in range(200):
        f = structured_formula(rng, max_terms=8, depth=3, rich=True,
                               envs=True)
        if ("\\begin" in f) == want_env:
            return f
    raise AssertionError("no env formula in 200 draws")


# ---------------------------------------------------------------------------
# grammar
# ---------------------------------------------------------------------------


def test_env_grammar_valid_and_roundtrips():
    rng = random.Random(7)
    n_env = 0
    for _ in range(500):
        f = structured_formula(rng, max_terms=8, depth=3, rich=True,
                               envs=True)
        ok, errs = check_latex(f)
        assert ok, (f, errs)
        # label strings are space-joined tokens: the tokenizer must
        # round-trip them verbatim or exact-match eval breaks
        assert " ".join(tokenize_latex(f)) == f
        n_env += "\\begin" in f
    assert n_env >= 50  # ~25% pre-filter; >=10% survives the length cap


def test_env_fraction_after_length_cap():
    rng = random.Random(3)
    kept = [f for f in (structured_formula(rng, max_terms=8, depth=3,
                                           rich=True, envs=True)
                        for _ in range(800))
            if len(f.split()) <= 60]
    frac = sum("\\begin" in f for f in kept) / len(kept)
    assert 0.08 <= frac <= 0.35, frac


def test_envs_off_by_default():
    rng = random.Random(1)
    for _ in range(300):
        f = structured_formula(rng, max_terms=8, depth=3, rich=True)
        assert "\\begin" not in f


def test_grammar_vocab_envs():
    base = grammar_vocab(rich=True)
    env = grammar_vocab(rich=True, envs=True)
    for t in ENV_TOKENS:
        assert t not in base
        assert t in env
    # specials keep their reserved ids
    assert env["<pad>"] == 0 and env["<sos>"] == 1 and env["<eos>"] == 2


def test_env_tokens_reach_constrainer():
    from handwritten_math_ocr_api_tpu.decode.constrain import build_tables

    tables = build_tables(grammar_vocab(rich=True, envs=True))
    assert tables.has_env
    assert not build_tables(grammar_vocab(rich=True)).has_env


# ---------------------------------------------------------------------------
# stroke rendering
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["matrix", "pmatrix", "bmatrix",
                                  "vmatrix", "cases"])
def test_render_each_env_kind(name):
    f = (rf"\begin {{ {name} }} a & b \ \ c & d \end {{ {name} }}")
    img = render_stroke_image(f, np.random.default_rng(5), 96, 320)
    ink = (img < 100).mean()
    assert 0.004 < ink < 0.6, ink  # some ink, not a blob


def test_env_render_distinguishes_delimiters():
    """pmatrix/bmatrix/vmatrix must add delimiter ink over bare matrix."""
    def ink(name):
        f = rf"\begin {{ {name} }} a & b \ \ c & d \end {{ {name} }}"
        # jitter=0 keeps layout deterministic; same seed -> same body
        img = render_stroke_image(f, np.random.default_rng(11), 96, 320,
                                  jitter=0.0)
        return (img < 100).sum()

    assert ink("pmatrix") > ink("matrix")
    assert ink("bmatrix") > ink("matrix")


def test_env_render_taller_than_inline():
    """A 3-row matrix must stack vertically: its ink bounding box is much
    taller relative to its width than the same cells laid out inline.
    (The rasterizer fit-scales into the image, so compare aspect, not
    absolute span.)"""
    def aspect(f):
        img = render_stroke_image(f, np.random.default_rng(9), 96, 320,
                                  jitter=0.0)
        ink = img < 100
        ys = np.where(ink.any(axis=1))[0]
        xs = np.where(ink.any(axis=0))[0]
        return (ys.max() - ys.min() + 1) / (xs.max() - xs.min() + 1)

    grid = aspect(r"\begin { matrix } a \ \ b \ \ c \end { matrix }")
    inline = aspect(r"a b c")
    assert grid > 2.0 * inline, (grid, inline)


def test_stream_dataset_envs_encode_clean():
    vocab = grammar_vocab(rich=True, envs=True)
    tok = Tokenizer(vocab)
    ds = StrokeStreamDataset(tok, 64, 96, 320, 150, seed=5, rich=True,
                             max_terms=8, depth=3, max_tokens=60,
                             envs=True, degrade=0.6)
    saw_env = False
    for i in range(64):
        f = ds.formula_at(i)
        ids = tok.encode(f)
        assert tok.unk_id not in ids, (f, "encoded with <unk>")
        saw_env = saw_env or "\\begin" in f
    assert saw_env
    img, ids, length = ds[0]
    assert img.shape == (96, 320) and img.dtype == np.uint8


# ---------------------------------------------------------------------------
# extend-vocab fine-tune path
# ---------------------------------------------------------------------------


def test_extend_vocab_map_preserves_ids():
    from handwritten_math_ocr_api_tpu.train.vocab_extend import (
        extend_vocab_map,
    )

    old = grammar_vocab(rich=True)
    new = extend_vocab_map(old, ENV_TOKENS)
    for t, i in old.items():
        assert new[t] == i
    added = {t: i for t, i in new.items() if t not in old}
    assert set(added) == set(ENV_TOKENS)
    assert min(added.values()) == max(old.values()) + 1
    assert sorted(added.values()) == list(
        range(min(added.values()), max(new.values()) + 1))


def test_extend_checkpoint_roundtrip(tmp_path):
    """End-to-end: save a tiny checkpoint, extend it, verify old-token
    logits are bit-identical and the artifact loads at the new size."""
    from handwritten_math_ocr_api_tpu.core.tokenizer import (
        load_vocab,
        save_vocab,
    )
    from handwritten_math_ocr_api_tpu.models import model as model_mod
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from handwritten_math_ocr_api_tpu.train.step import create_train_state
    from handwritten_math_ocr_api_tpu.train.vocab_extend import (
        extend_checkpoint,
    )

    old_vocab = grammar_vocab(rich=False)
    old_v = len(old_vocab)
    src = tmp_path / "src"
    out = tmp_path / "out"
    mc = ModelConfig(vocab_size=old_v, **TINY_MC)
    state, _ = create_train_state(jax.random.PRNGKey(3), mc,
                                  TrainConfig(ema_decay=0.999))
    src.mkdir()
    save_vocab(old_vocab, str(src / "vocab.json"))
    save_checkpoint(str(src), "best_model", state, epoch=7, metric=1.0)

    path, added = extend_checkpoint(str(src), "best_model", str(out), mc,
                                    seed=0)
    assert set(added) == set(ENV_TOKENS)

    new_vocab, _ = load_vocab(str(out / "vocab.json"))
    new_v = max(new_vocab.values()) + 1
    assert new_v == old_v + len(ENV_TOKENS)

    mc_new = ModelConfig(vocab_size=new_v, **TINY_MC)
    tmpl, _ = create_train_state(jax.random.PRNGKey(0), mc_new,
                                 TrainConfig(ema_decay=0.999))
    loaded, meta = load_checkpoint(str(out), "best_model", tmpl,
                                   params_only=True)
    assert meta["epoch"] == 0  # fresh fine-tune bookkeeping

    # same input -> identical logits on the original vocab slice
    imgs = np.zeros((1, mc.img_h, mc.img_w, 1), np.float32)
    caps = np.array([[1, 5, 6, 2] + [0] * (mc.max_seq_len - 4)], np.int32)
    old_logits, _ = model_mod.forward(state.params, state.model_state, mc,
                                      imgs, caps)
    new_logits, _ = model_mod.forward(loaded.params, loaded.model_state,
                                      mc_new, imgs, caps)
    np.testing.assert_array_equal(np.asarray(old_logits),
                                  np.asarray(new_logits)[..., :old_v])
    # EMA shadow resized too
    assert loaded.ema_params is not None
    assert (loaded.ema_params["decoder"]["embedding"]["table"].shape[0]
            == new_v)
