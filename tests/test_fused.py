"""Fused decoder-layer megakernel tests: single-step and full greedy
equivalence vs the jnp decode path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import ModelConfig
from handwritten_math_ocr_api_tpu.decode.fused import (
    greedy_decode_fused, init_fused_cache,
)
from handwritten_math_ocr_api_tpu.decode.greedy import greedy_decode
from handwritten_math_ocr_api_tpu.models import decoder as dec
from handwritten_math_ocr_api_tpu.ops.fused_step import (
    build_stacked, fused_decoder_layers_step, fused_decoder_layers_step_v2,
)

CFG = ModelConfig(
    d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
    num_decoder_layers=2, max_seq_len=12, vocab_size=20, dtype="float32",
)


@pytest.fixture(scope="module")
def setup():
    params = dec.init_decoder_params(jax.random.PRNGKey(0), CFG)
    stacked = build_stacked(params, CFG)
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((3, 6, CFG.d_model), np.float32))
    return params, stacked, memory


def test_fused_step_matches_jnp_step(setup):
    params, stacked, memory = setup
    B = memory.shape[0]
    cache = dec.init_cache(params, CFG, memory, max_len=16)
    sk, sv, ck, cv = init_fused_cache(params, CFG, memory, max_len=16)

    rng = np.random.default_rng(1)
    prev = jnp.asarray(rng.integers(0, CFG.vocab_size, (B,)), jnp.int32)
    for t in range(4):
        want, cache = dec.decoder_step(params, CFG, prev, jnp.int32(t),
                                       cache)
        x_emb = (params["embedding"]["table"][prev]
                 + params["pos"]["table"][t]).astype(jnp.float32)
        x, sk, sv = fused_decoder_layers_step(
            stacked, CFG, x_emb, sk, sv, ck, cv, jnp.int32(t),
            l_enc_actual=memory.shape[1], interpret=True)
        from handwritten_math_ocr_api_tpu.models import layers

        got = layers.linear(params["fc_out"], x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)
        prev = jnp.argmax(want, axis=-1).astype(jnp.int32)


@pytest.mark.parametrize("mxu_attn", [False, True])
def test_fused_step_v2_matches_jnp_step(setup, mxu_attn):
    """Compute-only kernel + external stacked-cache DUS == jnp step.

    mxu_attn=True covers the batched-MXU online-softmax attention
    formulation (variant "v2m")."""
    params, stacked, memory = setup
    B = memory.shape[0]
    cache = dec.init_cache(params, CFG, memory, max_len=16)
    sk, sv, ck, cv = init_fused_cache(params, CFG, memory, max_len=16)

    rng = np.random.default_rng(1)
    prev = jnp.asarray(rng.integers(0, CFG.vocab_size, (B,)), jnp.int32)
    for t in range(4):
        want, cache = dec.decoder_step(params, CFG, prev, jnp.int32(t),
                                       cache)
        x_emb = (params["embedding"]["table"][prev]
                 + params["pos"]["table"][t]).astype(jnp.float32)
        x, k_new, v_new = fused_decoder_layers_step_v2(
            stacked, CFG, x_emb, sk, sv, ck, cv, jnp.int32(t),
            l_enc_actual=memory.shape[1], interpret=True,
            mxu_attn=mxu_attn)
        sk = jax.lax.dynamic_update_slice(sk, k_new[:, :, None, :],
                                          (0, 0, t, 0))
        sv = jax.lax.dynamic_update_slice(sv, v_new[:, :, None, :],
                                          (0, 0, t, 0))
        from handwritten_math_ocr_api_tpu.models import layers

        got = layers.linear(params["fc_out"], x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)
        prev = jnp.argmax(want, axis=-1).astype(jnp.int32)


def test_fused_greedy_v1_variant_matches_jnp_greedy(setup):
    params, stacked, memory = setup
    want = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    got = greedy_decode_fused(params, stacked, CFG, memory,
                              CFG.max_seq_len, interpret=True, variant="v1")
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))


def test_fused_greedy_matches_jnp_greedy(setup):
    params, stacked, memory = setup
    want = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    got = greedy_decode_fused(params, stacked, CFG, memory,
                              CFG.max_seq_len, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_allclose(np.asarray(got.logprob_sum),
                               np.asarray(want.logprob_sum),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(got.token_count),
                                  np.asarray(want.token_count))


@pytest.mark.parametrize("variant", ["v3", "v4"])
def test_fused_greedy_whole_step_matches_jnp_greedy(setup, variant):
    """Whole-step kernel (embedding gather + layers + head + argmax all in
    one Pallas program): v4 = time-major caches with in-place aliased row
    writes; v3 = batch-major caches with external appends."""
    from handwritten_math_ocr_api_tpu.ops.fused_step import build_stacked_full

    params, _, memory = setup
    stacked_full = build_stacked_full(params, CFG)
    want = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    got = greedy_decode_fused(params, stacked_full, CFG, memory,
                              CFG.max_seq_len, interpret=True,
                              variant=variant)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_allclose(np.asarray(got.logprob_sum),
                               np.asarray(want.logprob_sum),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(got.token_count),
                                  np.asarray(want.token_count))


def test_build_stacked_full_padding():
    """Head-table padding: padded vocab columns must carry a -1e9 bias so
    they can never win the in-kernel argmax."""
    from handwritten_math_ocr_api_tpu.ops.fused_step import build_stacked_full

    params = dec.init_decoder_params(jax.random.PRNGKey(3), CFG)
    st = build_stacked_full(params, CFG)
    V = CFG.vocab_size
    assert st["emb"].shape[0] % 128 == 0
    assert st["w_head"].shape[1] == st["emb"].shape[0]
    assert float(jnp.abs(st["emb"][V:]).max()) == 0.0
    assert (np.asarray(st["b_head"][0, V:]) == -1e9).all()
    assert st["pos_emb"].shape[0] % 8 == 0


@pytest.mark.slow
def test_engine_use_fused_matches_default(setup):
    from handwritten_math_ocr_api_tpu.core.config import (
        DecodeConfig, SwinConfig,
    )
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = CFG.replace(swin=SwinConfig(embed_dim=8, depths=(1, 1),
                                      num_heads=(2, 2), window_size=4,
                                      stochastic_depth=0.0))
    params, state = init_model(jax.random.PRNGKey(1), cfg)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    tok = jax.tree_util.Partial  # placeholder to appease linters
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer

    tokz = Tokenizer(vocab)
    imgs = np.random.default_rng(0).standard_normal(
        (2, 96, 320, 1)).astype(np.float32)
    base = DecodeEngine(params, state, cfg,
                        DecodeConfig(batch_buckets=(2,)), tokz)
    fused = DecodeEngine(params, state, cfg,
                         DecodeConfig(batch_buckets=(2,)), tokz,
                         use_fused=True)
    assert base.predict_batch(imgs) == fused.predict_batch(imgs)
    a = base.predict_with_confidence(imgs)
    b = fused.predict_with_confidence(imgs)
    for (al, ac), (bl, bc) in zip(a, b):
        assert al == bl and abs(ac - bc) < 1e-3
    # fused + int8 in-kernel dequant ("v2q"): same surface, tokens close
    # (quantization can flip argmax ties on random weights)
    fused_q = DecodeEngine(params, state, cfg,
                           DecodeConfig(batch_buckets=(2,)), tokz,
                           use_fused=True, quantize=True)
    base_toks = base.predict_batch(imgs)
    q_toks = fused_q.predict_batch(imgs)
    assert len(q_toks) == len(base_toks)
    for qt, bt in zip(q_toks, base_toks):
        qs, bs = qt.split(), bt.split()
        agree = sum(x == y for x, y in zip(qs, bs))
        assert agree >= int(0.6 * min(len(qs), len(bs))), (qt, bt)


def test_fused_cache_layout_and_padding(setup):
    params, _, memory = setup
    sk, sv, ck, cv = init_fused_cache(params, CFG, memory, max_len=12)
    assert sk.shape == (2, 3, 16, 32)   # T=12 rounded to 16
    assert ck.shape == (2, 3, 16, 32)   # L_enc=6 rounded to 16
    # padding rows are zero; kernel masks them
    assert float(jnp.abs(ck[:, :, 6:]).max()) == 0.0


def test_fused_step_v2_quantized_matches_dequantized(setup):
    """v2 with int8 weights + in-kernel output-side dequant must equal v2
    run on the explicitly dequantized (w_q * scale) weights, up to the bf16
    matmul rounding the quantized path uses."""
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        WEIGHT_KEYS, quantize_stacked,
    )

    params, stacked, memory = setup
    stacked_q = quantize_stacked(stacked)
    stacked_dq = dict(stacked)
    for k in WEIGHT_KEYS:
        stacked_dq[k] = (stacked_q[k].astype(jnp.float32)
                         * stacked_q[f"{k}_s"])

    B = memory.shape[0]
    sk, sv, ck, cv = init_fused_cache(params, CFG, memory, max_len=16)
    rng = np.random.default_rng(2)
    prev = jnp.asarray(rng.integers(0, CFG.vocab_size, (B,)), jnp.int32)
    x_emb = (params["embedding"]["table"][prev]
             + params["pos"]["table"][0]).astype(jnp.float32)

    x_dq, k_dq, v_dq = fused_decoder_layers_step_v2(
        stacked_dq, CFG, x_emb, sk, sv, ck, cv, jnp.int32(0),
        l_enc_actual=memory.shape[1], interpret=True)
    x_q, k_q, v_q = fused_decoder_layers_step_v2(
        stacked_q, CFG, x_emb, sk, sv, ck, cv, jnp.int32(0),
        l_enc_actual=memory.shape[1], interpret=True)
    np.testing.assert_allclose(np.asarray(x_q), np.asarray(x_dq),
                               atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(k_q), np.asarray(k_dq),
                               atol=5e-2, rtol=5e-2)


def test_fused_greedy_v2_quantized_tokens_close(setup):
    """End-to-end greedy with in-kernel int8 weights: tokens should mostly
    match the full-precision fused path (int8 rounding can flip rare
    near-ties on random weights)."""
    from handwritten_math_ocr_api_tpu.ops.fused_step import quantize_stacked

    params, stacked, memory = setup
    want = greedy_decode_fused(params, stacked, CFG, memory,
                               CFG.max_seq_len, interpret=True)
    got = greedy_decode_fused(params, quantize_stacked(stacked), CFG,
                              memory, CFG.max_seq_len, interpret=True)
    tw, tg = np.asarray(want.tokens), np.asarray(got.tokens)
    assert (tw == tg).mean() > 0.8, (tw, tg)


# ---------------------------------------------------------------------------
# Fused beam decode (decode/fused.py::beam_decode_fused)
# ---------------------------------------------------------------------------


def _full_stacked(params):
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        build_stacked_full,
    )

    return build_stacked_full(params, CFG)


@pytest.mark.parametrize("beam", [2, 3])
def test_fused_beam_matches_jnp_beam(setup, beam):
    """Fused beam (ragged kernel, return_logits) ≡ XLA beam_decode:
    identical token sequences; scores within the greedy-loop logp
    tolerance (accumulated grouped-G summation-order noise)."""
    from handwritten_math_ocr_api_tpu.decode.beam import beam_decode
    from handwritten_math_ocr_api_tpu.decode.fused import beam_decode_fused

    params, _, memory = setup
    stacked = _full_stacked(params)
    want = beam_decode(params, CFG, memory, beam_size=beam)
    got = beam_decode_fused(params, stacked, CFG, memory, beam_size=beam,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(want.scores),
                               atol=5e-3, rtol=2e-3)
    np.testing.assert_array_equal(np.asarray(got.lengths),
                                  np.asarray(want.lengths))


def test_fused_beam_mqa_matches_jnp_beam():
    """MQA (nhead_kv=1): the shared-KV lane replication inside the ragged
    kernel must keep beam semantics identical to the grouped jnp path."""
    from handwritten_math_ocr_api_tpu.decode.beam import beam_decode
    from handwritten_math_ocr_api_tpu.decode.fused import beam_decode_fused
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        build_stacked_full,
    )

    cfg = ModelConfig(
        d_model=32, nhead=4, nhead_kv=1, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=2, max_seq_len=12, vocab_size=20,
        dtype="float32")
    params = dec.init_decoder_params(jax.random.PRNGKey(7), cfg)
    stacked = build_stacked_full(params, cfg)
    rng = np.random.default_rng(3)
    memory = jnp.asarray(rng.standard_normal((2, 6, 32), np.float32))
    want = beam_decode(params, cfg, memory, beam_size=5)
    got = beam_decode_fused(params, stacked, cfg, memory, beam_size=5,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))


@pytest.mark.slow
def test_fused_beam_padded_rows(setup):
    """B*K=35 rows pad to 40 (block 8): dead rows must never leak into
    the beam state (tokens identical to the XLA path)."""
    from handwritten_math_ocr_api_tpu.decode.beam import beam_decode
    from handwritten_math_ocr_api_tpu.decode.fused import beam_decode_fused

    params, _, _ = setup
    stacked = _full_stacked(params)
    rng = np.random.default_rng(11)
    memory = jnp.asarray(rng.standard_normal((7, 6, CFG.d_model),
                                             np.float32))
    want = beam_decode(params, CFG, memory, beam_size=5)
    got = beam_decode_fused(params, stacked, CFG, memory, beam_size=5,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))


def test_fused_beam_quantized_runs(setup):
    """int8 stacked bundle decodes through the beam kernel (in-kernel
    dequant) and stays close to the bf16 fused beam."""
    from handwritten_math_ocr_api_tpu.decode.fused import beam_decode_fused
    from handwritten_math_ocr_api_tpu.ops.fused_step import quantize_stacked

    params, _, memory = setup
    stacked = _full_stacked(params)
    qstacked = quantize_stacked(stacked)
    ref = beam_decode_fused(params, stacked, CFG, memory, beam_size=3,
                            interpret=True)
    got = beam_decode_fused(params, qstacked, CFG, memory, beam_size=3,
                            interpret=True)
    assert np.asarray(got.tokens).shape == np.asarray(ref.tokens).shape
    # int8 weight rounding shifts scores; sequences stay plausible (the
    # quantized-greedy test asserts token closeness on the same bundle)
    assert np.isfinite(np.asarray(got.scores)).all()


@pytest.mark.slow
def test_engine_fused_beam_matches_default_beam(setup):
    """DecodeEngine(use_fused=True).decode_tokens(beam_size=k) ≡ the
    default engine's beam tokens (full engine path incl. encoder)."""
    from handwritten_math_ocr_api_tpu.core.config import (
        DecodeConfig, SwinConfig,
    )
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig(
        d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=2, max_seq_len=12, vocab_size=20,
        dtype="float32",
        swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                        window_size=4, stochastic_depth=0.0))
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    imgs = np.random.default_rng(0).standard_normal(
        (2, 96, 320, 1)).astype(np.float32)
    eng_f = DecodeEngine(params, state, cfg,
                         DecodeConfig(batch_buckets=(2,)),
                         Tokenizer(vocab), use_fused=True)
    eng = DecodeEngine(params, state, cfg, DecodeConfig(batch_buckets=(2,)),
                       Tokenizer(vocab))
    got = eng_f.decode_tokens(imgs, beam_size=3)
    want = eng.decode_tokens(imgs, beam_size=3)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))


def test_fused_beam_single_image_8aligned_blocks(setup):
    """B=1, K=5 (BK=5): row blocks must pad to the 8-sublane tile. The
    old blocking chose bb=BK=5, which interpret mode accepted but
    hardware Mosaic rejected ("cannot statically prove that index in
    dimension 0 is a multiple of 8") — so /predict?beam_size=5 on a
    fused engine failed to compile on chip. Verified fixed on v5e
    (token agreement 1.000 vs the XLA beam at B=1/2/8)."""
    from handwritten_math_ocr_api_tpu.decode.beam import beam_decode
    from handwritten_math_ocr_api_tpu.decode.fused import beam_decode_fused

    params, _, memory = setup
    stacked = _full_stacked(params)
    for B, beam in ((1, 5), (2, 5)):   # BK=5 -> R=8/bb=8; BK=10 -> 16/16
        mem = memory[:B]
        want = beam_decode(params, CFG, mem, beam_size=beam)
        got = beam_decode_fused(params, stacked, CFG, mem, beam_size=beam,
                                interpret=True)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(want.tokens))


def test_fused_ragged_step_rejects_misaligned_block():
    """block_b must be a multiple of 8 (hardware sublane tile): the
    kernel now rejects it eagerly instead of failing deep inside the
    Mosaic compiler on chip (and silently passing in interpret mode)."""
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        build_stacked_full, fused_ragged_step,
    )

    params = dec.init_decoder_params(jax.random.PRNGKey(0), CFG)
    stacked = build_stacked_full(params, CFG)
    L, D = CFG.num_decoder_layers, CFG.d_model
    B, T = 5, 16
    sk = jnp.zeros((L, B, T, D))
    sv = jnp.zeros((L, B, T, D))
    ck = jnp.zeros((L, B, 16, D))
    cv = jnp.zeros((L, B, 16, D))
    prev = jnp.zeros((B,), jnp.int32)
    pos = jnp.zeros((B,), jnp.int32)
    with pytest.raises(ValueError, match="multiple of 8"):
        fused_ragged_step(stacked, CFG, prev, pos, sk, sv, ck, cv,
                          block_b=5, interpret=True)


def test_fused_sampled_topk1_matches_fused_greedy(setup):
    """Sampling on the fused path: top_k=1 must reduce to fused greedy,
    including the raw-distribution confidence accounting."""
    params, stacked, memory = setup
    g = greedy_decode_fused(params, stacked, CFG, memory, CFG.max_seq_len,
                            interpret=True)
    s = greedy_decode_fused(params, stacked, CFG, memory, CFG.max_seq_len,
                            interpret=True, rng=jax.random.PRNGKey(5),
                            temperature=1.9, top_k=1)
    np.testing.assert_array_equal(np.asarray(s.tokens), np.asarray(g.tokens))
    np.testing.assert_allclose(np.asarray(s.logprob_sum),
                               np.asarray(g.logprob_sum), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(s.token_count),
                                  np.asarray(g.token_count))


def test_fused_sampled_seeds_vary_and_v4_rejects(setup):
    params, stacked, memory = setup
    outs = []
    for seed in range(3):
        s = greedy_decode_fused(params, stacked, CFG, memory,
                                CFG.max_seq_len, interpret=True,
                                rng=jax.random.PRNGKey(seed),
                                temperature=3.0)
        outs.append(np.asarray(s.tokens))
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])
    with pytest.raises(NotImplementedError):
        greedy_decode_fused(params, stacked, CFG, memory, CFG.max_seq_len,
                            interpret=True, rng=jax.random.PRNGKey(0),
                            variant="v4")


def test_beam_cache_gather_kernel_matches_numpy():
    """ops/beam_reorder.py: the Pallas block-DMA parent gather must equal
    the take_along_axis formulation for arbitrary source maps, prefix
    extents, and dead-row identity mappings."""
    from handwritten_math_ocr_api_tpu.ops.beam_reorder import (
        beam_cache_gather,
    )

    rng = np.random.default_rng(9)
    L, R, T, kvd = 3, 24, 32, 64
    sk = jnp.asarray(rng.standard_normal((L, R, T, kvd)), jnp.float32)
    sv = jnp.asarray(rng.standard_normal((L, R, T, kvd)), jnp.float32)
    src = np.concatenate([rng.integers(0, 20, (20,)),
                          np.arange(20, 24)]).astype(np.int32)
    for t_ext in (16, 32):
        gk, gv = beam_cache_gather(sk, sv, jnp.asarray(src), t_ext)
        np.testing.assert_array_equal(
            np.asarray(gk), np.asarray(sk)[:, src, :t_ext])
        np.testing.assert_array_equal(
            np.asarray(gv), np.asarray(sv)[:, src, :t_ext])
