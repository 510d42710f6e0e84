"""Regression tests for the round-2 advisor findings (ADVICE.md):

1. (medium) DecodeEngine(use_fused=True, quantize=True): the beam-decode
   fallback must also run on int8 decoder weights, not silently report
   bf16 unfused numerics.
2. (low) decoder_step(use_pallas=True) with nhead_kv < nhead must take the
   grouped jnp path instead of dying in the MHA-only pallas kernel.
3. (low) greedy_decode_fused(variant="v5") auto-building its resident
   bundle must match the caller's quantization, not force int8.
4. (low) DecodeEngine(use_fused=True) on a GQA config must degrade to the
   XLA path with a warning, not raise at trace time.
5. (low) grouped_attention must normalize a rank-4 batch-leading mask
   itself (insert the group axis) instead of relying on each caller.
"""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import (
    DecodeConfig, ModelConfig, SwinConfig,
)
from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
from handwritten_math_ocr_api_tpu.models import decoder as dec
from handwritten_math_ocr_api_tpu.models import layers
from handwritten_math_ocr_api_tpu.models.model import init_model

TINY_SWIN = SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                       window_size=4, stochastic_depth=0.0)


def _cfg(**kw):
    base = dict(d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
                num_decoder_layers=2, max_seq_len=12, vocab_size=20,
                dtype="float32", swin=TINY_SWIN)
    base.update(kw)
    return ModelConfig(**base)


def _vocab(cfg):
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    return vocab


@pytest.mark.slow
def test_fused_quantize_beam_is_int8():
    """ADVICE #1: with use_fused+quantize, beam decode must see int8
    decoder weights. Since round 3 beam rides the fused path itself
    (decode/fused.py::beam_decode_fused) on the engine's quantized
    stacked bundle — no separate jnp fallback params — so the int8
    promise holds in-kernel: the engine's beam result must equal
    beam_decode_fused on an explicitly quantized bundle."""
    cfg = _cfg()
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, state, cfg,
                       DecodeConfig(max_seq_len=cfg.max_seq_len,
                                    batch_buckets=(2,)),
                       Tokenizer(_vocab(cfg)), use_fused=True, quantize=True)
    # the engine keeps float params; the shared stacked bundle is int8
    assert "w_qkv" in eng.params["decoder"]["layers"][0]["self_attn"]
    assert "w_qkv_s" in eng._stacked
    imgs = np.random.default_rng(0).standard_normal(
        (2, 96, 320, 1)).astype(np.float32)
    res = eng.decode_tokens(imgs, beam_size=2)
    assert res.tokens.shape[0] == 2
    # beam result == fused beam on an explicitly quantized full bundle
    from handwritten_math_ocr_api_tpu.decode.fused import beam_decode_fused
    from handwritten_math_ocr_api_tpu.models.model import encode
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        build_stacked_full, quantize_stacked,
    )

    memory, _ = encode(params, state, cfg, jnp.asarray(imgs))
    qstacked = quantize_stacked(build_stacked_full(params["decoder"], cfg))
    ref = beam_decode_fused(params["decoder"], qstacked, cfg, memory,
                            beam_size=2, max_len=cfg.max_seq_len)
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(ref.tokens))


@pytest.mark.parametrize("nhead_kv", [1, 2])
def test_decoder_step_use_pallas_falls_back_for_grouped_kv(nhead_kv):
    """ADVICE #2: use_pallas with MQA/GQA takes the grouped jnp path and
    matches the non-pallas step exactly."""
    cfg = _cfg(nhead_kv=nhead_kv)
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2,)), jnp.int32)
    c1 = dec.init_cache(params, cfg, memory, max_len=8)
    c2 = dec.init_cache(params, cfg, memory, max_len=8)
    want, _ = dec.decoder_step(params, cfg, ids, jnp.int32(0), c1)
    got, _ = dec.decoder_step(params, cfg, ids, jnp.int32(0), c2,
                              use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_v5_autobuild_matches_caller_quantization(monkeypatch):
    """ADVICE #3: a bf16/f32 build_stacked bundle auto-completes to a
    float resident bundle; a quantize_stacked bundle to int8."""
    from handwritten_math_ocr_api_tpu.decode import fused as fused_mod
    from handwritten_math_ocr_api_tpu.ops import whole_decode
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        build_stacked, quantize_stacked,
    )

    cfg = _cfg()
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    seen = []
    real = whole_decode.build_resident

    def spy(p, c, quantize=False):
        seen.append(quantize)
        return real(p, c, quantize=quantize)

    monkeypatch.setattr(whole_decode, "build_resident", spy)
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    stacked = build_stacked(params, cfg)
    fused_mod.greedy_decode_fused(params, stacked, cfg, memory, 8,
                                  interpret=True, variant="v5")
    q = quantize_stacked(stacked)
    fused_mod.greedy_decode_fused(params, q, cfg, memory, 8,
                                  interpret=True, variant="v5")
    assert seen == [False, True]


def test_engine_gqa_degrades_to_xla_path(caplog):
    """ADVICE #4: SERVING_USE_FUSED with a GQA checkpoint serves on the
    XLA path (logged) instead of crashing inside jit."""
    cfg = _cfg(nhead_kv=2)  # GQA: 1 < 2 < 4
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    with caplog.at_level(logging.WARNING):
        eng = DecodeEngine(params, state, cfg,
                           DecodeConfig(batch_buckets=(2,)),
                           Tokenizer(_vocab(cfg)), use_fused=True)
    assert eng.use_fused is False
    assert any("GQA" in r.message for r in caplog.records)
    imgs = np.random.default_rng(0).standard_normal(
        (2, 96, 320, 1)).astype(np.float32)
    outs = eng.predict_with_confidence(imgs)
    assert len(outs) == 2 and all(0.0 <= c <= 1.0 for _, c in outs)
    # MQA (nhead_kv=1) keeps the fused path
    cfg_mqa = _cfg(nhead_kv=1)
    params_m, state_m = init_model(jax.random.PRNGKey(0), cfg_mqa)
    eng_m = DecodeEngine(params_m, state_m, cfg_mqa,
                         DecodeConfig(batch_buckets=(2,)),
                         Tokenizer(_vocab(cfg_mqa)), use_fused=True)
    assert eng_m.use_fused is True


@pytest.mark.parametrize("head_dim_of_mask", [1, 2, 4])
def test_grouped_attention_normalizes_rank4_mask(head_dim_of_mask):
    """ADVICE #5: rank-4 masks (batch-leading, head axis 1/Hkv/H) are
    normalized inside grouped_attention; result == materialized-MHA
    attention with the same mask."""
    H, HKV, B, LQ, LK, DH = 4, 2, 3, 2, 5, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, LQ, DH)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HKV, LK, DH)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, HKV, LK, DH)), jnp.float32)
    mask = jnp.where(
        jnp.asarray(rng.random((B, head_dim_of_mask, LQ, LK)) > 0.3),
        0.0, -jnp.inf).astype(jnp.float32)
    got = layers.grouped_attention(q, k, v, mask, H)
    # reference: replicate kv heads up to H and use plain attention
    g = H // HKV
    k_full = jnp.repeat(k, g, axis=1)
    v_full = jnp.repeat(v, g, axis=1)
    if head_dim_of_mask == HKV:  # kv-head-aligned mask replicates per group
        mask_full = jnp.repeat(mask, g, axis=1)
    else:
        mask_full = mask
    want = layers.attention(q, k_full, v_full, mask_full)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
