"""Decode engine tests: greedy scan vs naive prefix-recompute decode,
beam-1 vs greedy, beam score dominance, early exit, confidence math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import (
    EOS_ID, PAD_ID, SOS_ID, DecodeConfig, ModelConfig,
)
from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
from handwritten_math_ocr_api_tpu.decode.api import (
    DecodeEngine, pick_bucket,
)
from handwritten_math_ocr_api_tpu.decode.beam import beam_decode
from handwritten_math_ocr_api_tpu.decode.greedy import greedy_decode
from handwritten_math_ocr_api_tpu.models import decoder as dec

CFG = ModelConfig(
    d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
    num_decoder_layers=2, max_seq_len=12, vocab_size=20, dtype="float32",
)


@pytest.fixture(scope="module")
def setup():
    params = dec.init_decoder_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((3, 6, CFG.d_model), np.float32))
    return params, memory


def naive_greedy(params, cfg, memory, max_len):
    """Reference-style decode: re-run the full decoder on the growing prefix
    (semantics of src/inference.py:14-25)."""
    B = memory.shape[0]
    ys = np.full((B, 1), SOS_ID, np.int64)
    finished = np.zeros(B, bool)
    for _ in range(max_len):
        logits = dec.decoder_forward(params, cfg, memory, jnp.asarray(ys))
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], -1))
        ys = np.concatenate([ys, nxt[:, None]], axis=1)
        finished |= nxt == EOS_ID
        if finished.all():
            break
    return ys[:, 1:]  # drop sos


@pytest.mark.slow
def test_greedy_matches_naive_prefix_decode(setup):
    params, memory = setup
    res = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    naive = naive_greedy(params, CFG, memory, CFG.max_seq_len)
    ours = np.asarray(res.tokens)
    for b in range(memory.shape[0]):
        row_naive = naive[b]
        # compare up to and including first eos (pad beyond)
        for t in range(min(len(row_naive), CFG.max_seq_len)):
            assert ours[b, t] == row_naive[t], (b, t, ours[b], row_naive)
            if row_naive[t] == EOS_ID:
                assert np.all(ours[b, t + 1:] == PAD_ID)
                break


def test_greedy_early_exit_pads_tail(setup):
    params, memory = setup
    res = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    toks = np.asarray(res.tokens)
    for b in range(toks.shape[0]):
        eos_pos = np.where(toks[b] == EOS_ID)[0]
        if eos_pos.size:
            assert np.all(toks[b, eos_pos[0] + 1:] == PAD_ID)


def _sequence_logprob(params, cfg, memory_row, token_row):
    """Teacher-forced log-prob of a generated row (up to incl. eos)."""
    toks = [t for t in token_row if t != PAD_ID]
    ids = jnp.asarray([[SOS_ID] + toks])
    logits = dec.decoder_forward(params, cfg, memory_row[None], ids)
    logp = jax.nn.log_softmax(logits[0, :-1], axis=-1)
    return float(sum(logp[i, toks[i]] for i in range(len(toks))))


def test_beam1_equals_greedy(setup):
    params, memory = setup
    g = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    b = beam_decode(params, CFG, memory, beam_size=1, max_len=CFG.max_seq_len)
    np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.tokens))


@pytest.mark.slow
def test_beam_score_dominates_greedy(setup):
    params, memory = setup
    g = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    b = beam_decode(params, CFG, memory, beam_size=4, max_len=CFG.max_seq_len)
    for i in range(memory.shape[0]):
        gs = _sequence_logprob(params, CFG, memory[i], list(np.asarray(g.tokens[i])))
        bs = _sequence_logprob(params, CFG, memory[i], list(np.asarray(b.tokens[i])))
        assert bs >= gs - 1e-4


def test_beam_internal_score_consistent(setup):
    """Beam's accumulated score must equal the teacher-forced log-prob."""
    params, memory = setup
    b = beam_decode(params, CFG, memory, beam_size=3, max_len=CFG.max_seq_len)
    for i in range(memory.shape[0]):
        expected = _sequence_logprob(params, CFG, memory[i],
                                     list(np.asarray(b.tokens[i])))
        assert abs(float(b.scores[i]) - expected) < 1e-3


def test_pick_bucket():
    assert pick_bucket(1, (1, 2, 4)) == 1
    assert pick_bucket(3, (1, 2, 4)) == 4
    assert pick_bucket(9, (1, 2, 4)) == 4  # clamps to largest


def test_engine_surfaces(setup):
    params, _ = setup
    # full model engine with a tiny swin
    from handwritten_math_ocr_api_tpu.core.config import SwinConfig
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig(
        d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=2, max_seq_len=10, vocab_size=20, dtype="float32",
        swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                        window_size=4, stochastic_depth=0.0),
    )
    mparams, mstate = init_model(jax.random.PRNGKey(1), cfg)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, 20):
        vocab[f"t{i}"] = i
    tok = Tokenizer(vocab)
    eng = DecodeEngine(mparams, mstate, cfg,
                       DecodeConfig(max_seq_len=10, batch_buckets=(2, 4)),
                       tok)
    imgs = np.random.default_rng(0).standard_normal((3, 96, 320, 1)).astype(np.float32)
    outs = eng.predict_batch(imgs)
    assert len(outs) == 3 and all(isinstance(s, str) for s in outs)
    outs_beam = eng.predict_batch(imgs, beam_size=2)
    assert len(outs_beam) == 3

    latex, conf = eng.predict_single(imgs[0])
    assert isinstance(latex, str)
    assert 0.0 <= conf <= 1.0
    # batch bucketing: batch of 3 must give identical result to batch of 4
    outs4 = eng.predict_batch(np.concatenate([imgs, imgs[:1]], 0))
    assert outs4[:3] == outs


def test_confidence_matches_reference_formula(setup):
    """Recompute exp(mean log(softmax+1e-10)) by hand from the greedy trace."""
    params, memory = setup
    res = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    b = 0
    toks = [int(t) for t in np.asarray(res.tokens[b]) if t != PAD_ID]
    ids = jnp.asarray([[SOS_ID] + toks[:-1] if toks and toks[-1] == EOS_ID
                       else [SOS_ID] + toks])
    # teacher-forced probs over each emitted step (incl. eos step)
    full_ids = jnp.asarray([[SOS_ID] + toks])
    logits = dec.decoder_forward(params, CFG, memory[b][None], full_ids)
    probs = jax.nn.softmax(logits[0, :-1], axis=-1)
    lp = sum(float(jnp.log(probs[i, toks[i]] + 1e-10))
             for i in range(len(toks)))
    n_non_eos = len([t for t in toks if t != EOS_ID])
    assert abs(float(res.logprob_sum[b]) - lp) < 1e-3
    assert int(res.token_count[b]) == n_non_eos


@pytest.mark.slow
def test_beam_indirect_equals_reorder(setup):
    """Ancestry-indirection beam (no per-step cache reorder) must produce
    identical tokens/scores/lengths to the reorder implementation."""
    from handwritten_math_ocr_api_tpu.decode.beam import beam_decode_indirect

    params, memory = setup
    for k in (2, 3, 5):
        want = beam_decode(params, CFG, memory, beam_size=k,
                           max_len=CFG.max_seq_len)
        got = beam_decode_indirect(params, CFG, memory, beam_size=k,
                                   max_len=CFG.max_seq_len)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(want.tokens))
        np.testing.assert_allclose(np.asarray(got.scores),
                                   np.asarray(want.scores),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.lengths),
                                      np.asarray(want.lengths))


def test_beam_indirect_jits(setup):
    from handwritten_math_ocr_api_tpu.decode.beam import beam_decode_indirect

    params, memory = setup
    f = jax.jit(lambda p, m: beam_decode_indirect(p, CFG, m, beam_size=3))
    res = f(params, memory)
    assert res.tokens.shape == (3, CFG.max_seq_len)


# ---- sampling (decode/sampling.py) ----------------------------------------

def test_filter_logits_topk_topp():
    from handwritten_math_ocr_api_tpu.decode.sampling import filter_logits

    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]])
    # top_k=2 keeps exactly the two largest
    f = np.asarray(filter_logits(logits, top_k=2))
    assert (f[0] > -1e29).tolist() == [False, False, False, True, True]
    # top_p: probs of sorted [4,3,2,1,0] ≈ [.636,.234,.086,.032,.012];
    # top_p=0.7 keeps {4} then crossing token {3} -> two survivors
    f = np.asarray(filter_logits(logits, top_p=0.7))
    assert (f[0] > -1e29).tolist() == [False, False, False, True, True]
    # tiny top_p still keeps the argmax
    f = np.asarray(filter_logits(logits, top_p=1e-6))
    assert (f[0] > -1e29).tolist() == [False, False, False, False, True]
    # temperature rescales without masking
    f = np.asarray(filter_logits(logits, temperature=2.0))
    np.testing.assert_allclose(f, np.asarray(logits) / 2.0, rtol=1e-6)


def test_sampling_topk1_matches_greedy(setup):
    from handwritten_math_ocr_api_tpu.decode.sampling import sample_decode

    params, memory = setup
    g = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    s = sample_decode(params, CFG, memory, jax.random.PRNGKey(3),
                      CFG.max_seq_len, temperature=1.7, top_k=1)
    np.testing.assert_array_equal(np.asarray(s.tokens), np.asarray(g.tokens))
    # confidence comes from the RAW distribution -> identical to greedy
    np.testing.assert_allclose(np.asarray(s.logprob_sum),
                               np.asarray(g.logprob_sum), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(s.token_count),
                                  np.asarray(g.token_count))


def test_sampling_low_temperature_limit_matches_greedy(setup):
    from handwritten_math_ocr_api_tpu.decode.sampling import sample_decode

    params, memory = setup
    g = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    s = sample_decode(params, CFG, memory, jax.random.PRNGKey(11),
                      CFG.max_seq_len, temperature=1e-5)
    np.testing.assert_array_equal(np.asarray(s.tokens), np.asarray(g.tokens))


def test_sampling_seeds_vary_output(setup):
    from handwritten_math_ocr_api_tpu.decode.sampling import sample_decode

    params, memory = setup
    outs = []
    for seed in range(4):
        s = sample_decode(params, CFG, memory, jax.random.PRNGKey(seed),
                          CFG.max_seq_len, temperature=3.0)
        outs.append(np.asarray(s.tokens))
    assert any(not np.array_equal(outs[0], o) for o in outs[1:]), \
        "high-temperature sampling produced identical outputs for all seeds"


@pytest.mark.slow
def test_engine_sampling_surfaces():
    from handwritten_math_ocr_api_tpu.core.config import SwinConfig
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig(
        d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=2, max_seq_len=10, vocab_size=20, dtype="float32",
        swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                        window_size=4, stochastic_depth=0.0),
    )
    mparams, mstate = init_model(jax.random.PRNGKey(1), cfg)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, 20):
        vocab[f"t{i}"] = i
    tok = Tokenizer(vocab, {i: t for t, i in vocab.items()})
    engine = DecodeEngine(mparams, mstate, cfg,
                          DecodeConfig(max_seq_len=10), tok)
    img = np.random.default_rng(0).standard_normal(
        (1, cfg.img_h, cfg.img_w, 1)).astype(np.float32)
    res = engine.sample_tokens(img, temperature=1.5, top_k=4, seed=7)
    assert res.tokens.shape[0] == 1
    latex, conf = engine.predict_single_sampled(
        img[0], temperature=1.5, top_k=4, seed=7)
    assert isinstance(latex, str) and 0.0 <= conf <= 1.0
    # greedy limit through the engine surface
    latex_g, conf_g = engine.predict_single(img[0])
    latex_s, conf_s = engine.predict_single_sampled(img[0], top_k=1)
    assert latex_s == latex_g and abs(conf_s - conf_g) < 1e-5


# ---- streaming (decode/streaming.py) ---------------------------------------

@pytest.mark.slow
def test_stream_segments_match_greedy(setup):
    """Concatenated segment tokens + accounting must equal the one-shot
    greedy while-loop decode, for segment lengths that do and don't divide
    max_len."""
    from handwritten_math_ocr_api_tpu.decode.streaming import (
        stream_segment, stream_start,
    )

    params, memory = setup
    g = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    for seg in (3, 4, 12):
        carry = stream_start(params, CFG, memory, CFG.max_seq_len, seg)
        rows = []
        steps = 0
        while steps < CFG.max_seq_len and not bool(
                np.asarray(carry.finished).all()):
            carry, toks = stream_segment(params, CFG, carry, seg)
            rows.append(np.asarray(toks))
            steps += seg
        streamed = np.concatenate(rows, axis=1)[:, :CFG.max_seq_len]
        want = np.asarray(g.tokens)
        np.testing.assert_array_equal(streamed[:, :want.shape[1]], want,
                                      err_msg=f"segment={seg}")
        np.testing.assert_allclose(np.asarray(carry.lp_sum),
                                   np.asarray(g.logprob_sum), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(carry.count),
                                      np.asarray(g.token_count))


@pytest.mark.slow
def test_engine_predict_stream_matches_predict_single():
    from handwritten_math_ocr_api_tpu.core.config import SwinConfig
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig(
        d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=2, max_seq_len=10, vocab_size=20, dtype="float32",
        swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                        window_size=4, stochastic_depth=0.0),
    )
    mparams, mstate = init_model(jax.random.PRNGKey(1), cfg)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, 20):
        vocab[f"t{i}"] = i
    tok = Tokenizer(vocab, {i: t for t, i in vocab.items()})
    engine = DecodeEngine(mparams, mstate, cfg,
                          DecodeConfig(max_seq_len=10), tok)
    img = np.random.default_rng(0).standard_normal(
        (cfg.img_h, cfg.img_w, 1)).astype(np.float32)

    events = list(engine.predict_stream(img, segment_steps=4))
    assert events and events[-1].get("done")
    final = events[-1]
    token_events = [e for e in events[:-1]]
    assert all("tokens" in e for e in token_events)
    streamed_text = " ".join(
        t for e in token_events for t in e["tokens"])

    latex, conf = engine.predict_single(img)
    assert final["formula"] == latex
    assert abs(final["confidence"] - conf) < 1e-5
    # the streamed tokens are the uncleaned token stream of the same decode
    from handwritten_math_ocr_api_tpu.core.tokenizer import (
        clean_latex_output,
    )
    assert clean_latex_output(streamed_text) == latex
