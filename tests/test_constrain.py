"""Pushdown-constrained decoding tests (decode/constrain.py).

The central guarantee is the PROPERTY test: for randomly initialized
decoders (argmax of near-random logits — the adversarial regime for
structural validity), every constrained decode must pass the structural
validator ``eval/latex_check.check_latex``, while unconstrained decodes
from the same weights are demonstrably invalid. Plus state-machine unit
tests for each masking rule, and fused-path (Pallas interpret) equivalence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import (
    EOS_ID, PAD_ID, SOS_ID, ModelConfig,
)
from handwritten_math_ocr_api_tpu.decode import constrain
from handwritten_math_ocr_api_tpu.decode.greedy import greedy_decode
from handwritten_math_ocr_api_tpu.eval.latex_check import check_latex
from handwritten_math_ocr_api_tpu.models import decoder as dec

STRUCT_TOKENS = [
    "{", "}", "\\left", "\\right", "\\begin", "\\end", "^", "_",
    "\\frac", "\\sqrt", "\\hat", "\\binom",
]
PLAIN_TOKENS = ["(", ")", "+", "=", "a", "b", "x", "y", "1", "2",
                "matrix", "cases", "\\alpha", "\\sum"]


def make_vocab(tokens):
    vocab = {"<pad>": PAD_ID, "<sos>": SOS_ID, "<eos>": EOS_ID, "<unk>": 3}
    for t in tokens:
        vocab[t] = len(vocab)
    return vocab


VOCAB = make_vocab(STRUCT_TOKENS + PLAIN_TOKENS)
IDX2TOK = {i: t for t, i in VOCAB.items()}
TABLES = constrain.build_tables(VOCAB)


def detok(row):
    out = []
    for t in np.asarray(row):
        if t == EOS_ID:
            break
        if t in (PAD_ID, SOS_ID):
            continue
        out.append(IDX2TOK[int(t)])
    return " ".join(out)


def cfg_for(max_len):
    return ModelConfig(d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
                       num_decoder_layers=2, max_seq_len=max_len,
                       vocab_size=len(VOCAB), dtype="float32")


# --------------------------------------------------------------------------
# property: constrained random decodes are ALWAYS valid
# --------------------------------------------------------------------------

@pytest.mark.parametrize("max_len", [8, 24, 48])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_constrained_random_decode_always_valid(seed, max_len):
    cfg = cfg_for(max_len)
    params = dec.init_decoder_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    memory = jnp.asarray(
        rng.standard_normal((6, 5, cfg.d_model)).astype(np.float32) * 3)
    res = greedy_decode(params, cfg, memory, max_len, constraint=TABLES)
    for b in range(6):
        s = detok(res.tokens[b])
        ok, errs = check_latex(s)
        assert ok, (seed, max_len, s, errs)


def test_unconstrained_random_decodes_are_often_invalid():
    """Sanity that the property test has teeth: the same random models DO
    emit structurally invalid LaTeX without the mask."""
    invalid = 0
    for seed in range(3):
        cfg = cfg_for(24)
        params = dec.init_decoder_params(jax.random.PRNGKey(seed), cfg)
        rng = np.random.default_rng(seed)
        memory = jnp.asarray(
            rng.standard_normal((6, 5, cfg.d_model)).astype(np.float32) * 3)
        res = greedy_decode(params, cfg, memory, 24)
        for b in range(6):
            if not check_latex(detok(res.tokens[b]))[0]:
                invalid += 1
    assert invalid > 0


def test_constraint_noop_on_plain_vocab():
    """With no structural tokens in the vocab (and the model never
    preferring the always-banned <pad>/<sos>/<unk>), the mask never fires
    and constrained decode equals unconstrained exactly."""
    vocab = make_vocab(PLAIN_TOKENS)
    tables = constrain.build_tables(vocab)
    cfg = ModelConfig(d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
                      num_decoder_layers=2, max_seq_len=16,
                      vocab_size=len(vocab), dtype="float32")
    params = dec.init_decoder_params(jax.random.PRNGKey(7), cfg)
    b = np.asarray(params["fc_out"]["b"]).copy()
    b[[PAD_ID, SOS_ID, 3]] = -1e4  # keep unconstrained off banned specials
    params["fc_out"]["b"] = jnp.asarray(b)
    memory = jnp.asarray(np.random.default_rng(7).standard_normal(
        (4, 5, cfg.d_model)).astype(np.float32))
    plain = greedy_decode(params, cfg, memory, 16)
    cons = greedy_decode(params, cfg, memory, 16, constraint=tables)
    np.testing.assert_array_equal(np.asarray(plain.tokens),
                                  np.asarray(cons.tokens))
    np.testing.assert_allclose(np.asarray(plain.logprob_sum),
                               np.asarray(cons.logprob_sum), rtol=1e-6)


# --------------------------------------------------------------------------
# state machine unit tests
# --------------------------------------------------------------------------

def feed(tokens):
    """Drive the machine over a token-string sequence; returns the state."""
    state = constrain.init_state(1)
    for t in tokens:
        state = constrain.advance(
            TABLES, state, jnp.asarray([VOCAB[t]], jnp.int32))
    return state


def allowed_set(state, step, max_len=50):
    mask = np.asarray(constrain.step_mask(
        TABLES, state, jnp.int32(step), max_len))[0]
    return {IDX2TOK[i] for i in range(len(mask)) if mask[i] == 0.0}


def test_close_requires_open():
    a = allowed_set(constrain.init_state(1), 0)
    assert "}" not in a and "\\right" not in a and "\\end" not in a
    assert "<eos>" in a and "{" in a and "a" in a


def test_eos_blocked_inside_group():
    st = feed(["{"])
    a = allowed_set(st, 1)
    assert "<eos>" not in a and "}" in a
    st = feed(["{", "a", "}"])
    assert "<eos>" in allowed_set(st, 3)


def test_left_right_pairing():
    st = feed(["\\left", "("])
    a = allowed_set(st, 2)
    assert "\\right" in a and "<eos>" not in a and "}" not in a
    st = feed(["\\left", "(", "x", "\\right"])
    a = allowed_set(st, 4)
    # \right needs a delimiter token after it
    assert "<eos>" not in a and "(" in a
    st = feed(["\\left", "(", "x", "\\right", ")"])
    assert "<eos>" in allowed_set(st, 5)


def test_arg_command_obligations():
    st = feed(["\\frac"])
    a = allowed_set(st, 1)
    assert "}" not in a and "<eos>" not in a
    # one single-token argument consumed, second still owed
    st = feed(["\\frac", "a"])
    assert "<eos>" not in allowed_set(st, 2)
    st = feed(["\\frac", "a", "b"])
    assert "<eos>" in allowed_set(st, 3)
    # group arguments: { a } { b }
    st = feed(["\\frac", "{", "a", "}"])
    assert "<eos>" not in allowed_set(st, 4)
    st = feed(["\\frac", "{", "a", "}", "{", "b", "}"])
    assert "<eos>" in allowed_set(st, 7)
    # 1-arg command
    st = feed(["\\sqrt", "x"])
    assert "<eos>" in allowed_set(st, 2)


def test_supsub_rules():
    assert "^" not in allowed_set(constrain.init_state(1), 0)
    st = feed(["x", "^"])
    a = allowed_set(st, 2)
    assert "^" not in a and "_" not in a and "}" not in a
    st = feed(["x", "^", "2"])
    assert "<eos>" in allowed_set(st, 3)


def test_env_names_forced_to_match():
    st = feed(["\\begin"])
    assert allowed_set(st, 1) == {"{"}
    st = feed(["\\begin", "{"])
    a = allowed_set(st, 2)
    assert "matrix" in a and "cases" in a and "{" not in a and "+" not in a
    st = feed(["\\begin", "{", "matrix"])
    assert allowed_set(st, 3) == {"}"}
    st = feed(["\\begin", "{", "matrix", "}", "x"])
    a = allowed_set(st, 5)
    assert "\\end" in a and "<eos>" not in a
    st = feed(["\\begin", "{", "matrix", "}", "x", "\\end", "{"])
    # the closing name is FORCED to the opening one
    assert allowed_set(st, 7) == {"matrix"}
    st = feed(["\\begin", "{", "matrix", "}", "x",
               "\\end", "{", "matrix", "}"])
    assert "<eos>" in allowed_set(st, 9)


def test_budget_blocks_openers_near_the_end():
    st = constrain.init_state(1)
    # 1 step after this one: '{' is still fine ('}' fits), 2+-cost tokens
    # are not
    a = allowed_set(st, step=8, max_len=10)
    assert "{" in a and "\\begin" not in a and "\\frac" not in a
    assert "\\left" not in a and "a" in a and "<eos>" in a
    # at the last step nothing may open or owe
    a = allowed_set(st, step=9, max_len=10)
    assert "{" not in a and "\\sqrt" not in a and "^" not in a
    assert "a" in a and "<eos>" in a
    # with an open group and 0 steps after this one, only '}' closes in time
    st = feed(["a", "{"])
    a = allowed_set(st, step=9, max_len=10)
    assert "}" in a and "{" not in a and "a" not in a and "<eos>" not in a


def test_nested_obligations_lifo():
    # x ^ { \frac a b }  — the ^ obligation is consumed by the group
    st = feed(["x", "^", "{", "\\frac", "a", "b", "}"])
    assert "<eos>" in allowed_set(st, 7)
    st = feed(["x", "^", "{", "\\frac", "a", "}"])
    # inner \frac got one arg; '}' closed the ^ group... but \frac still
    # owes one unit INSIDE the group — '}' must not have been allowed
    a = allowed_set(feed(["x", "^", "{", "\\frac", "a"]), 5)
    assert "}" not in a


# --------------------------------------------------------------------------
# fused-path equivalence (Pallas interpret mode)
# --------------------------------------------------------------------------

def test_fused_constrained_matches_xla_constrained():
    from handwritten_math_ocr_api_tpu.decode.fused import greedy_decode_fused
    from handwritten_math_ocr_api_tpu.ops.fused_step import build_stacked

    cfg = cfg_for(24)
    params = dec.init_decoder_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    memory = jnp.asarray(
        rng.standard_normal((4, 5, cfg.d_model)).astype(np.float32) * 3)
    want = greedy_decode(params, cfg, memory, 24, constraint=TABLES)
    stacked = build_stacked(params, cfg)
    got = greedy_decode_fused(params, stacked, cfg, memory, 24,
                              interpret=True, constraint=TABLES)
    np.testing.assert_array_equal(np.asarray(want.tokens),
                                  np.asarray(got.tokens))
    for b in range(4):
        ok, errs = check_latex(detok(got.tokens[b]))
        assert ok, (detok(got.tokens[b]), errs)


# --------------------------------------------------------------------------
# engine surface
# --------------------------------------------------------------------------

def test_engine_constrained_outputs_valid():
    from handwritten_math_ocr_api_tpu.core.config import (
        DecodeConfig, SwinConfig,
    )
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig(
        d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=2, max_seq_len=20, vocab_size=len(VOCAB),
        dtype="float32",
        swin=__import__("handwritten_math_ocr_api_tpu.core.config",
                        fromlist=["SwinConfig"]).SwinConfig(
            embed_dim=8, depths=(1, 1), num_heads=(2, 2), window_size=4,
            stochastic_depth=0.0),
    )
    mparams, mstate = init_model(jax.random.PRNGKey(2), cfg)
    tok = Tokenizer(VOCAB)
    eng = DecodeEngine(mparams, mstate, cfg,
                       DecodeConfig(max_seq_len=20, batch_buckets=(4,)),
                       tok, constrained=True)
    imgs = np.random.default_rng(1).standard_normal(
        (4, 96, 320, 1)).astype(np.float32)
    for formula, conf in eng.predict_with_confidence(imgs):
        ok, errs = check_latex(formula)
        assert ok, (formula, errs)
        assert conf is None or 0.0 <= conf <= 1.0


def test_engine_constrained_requires_tokenizer():
    from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine

    with pytest.raises(ValueError, match="tokenizer"):
        DecodeEngine({}, {}, cfg_for(8), None, None, constrained=True)
