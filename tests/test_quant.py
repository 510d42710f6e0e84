"""int8 weight-only quantization tests: exactness of the dequant identity,
closeness of quantized decode, and engine integration."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import (
    DecodeConfig, ModelConfig, SwinConfig,
)
from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
from handwritten_math_ocr_api_tpu.decode.greedy import greedy_decode
from handwritten_math_ocr_api_tpu.models import decoder as dec
from handwritten_math_ocr_api_tpu.models.model import init_model
from handwritten_math_ocr_api_tpu.ops.quant import (
    dequant_matmul, quantize_decoder_params, quantize_weight,
    quantized_bytes,
)

CFG = ModelConfig(
    d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
    num_decoder_layers=2, max_seq_len=12, vocab_size=20, dtype="float32",
    swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                    window_size=4, stochastic_depth=0.0),
)


def test_quantize_weight_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    w_q, scale = quantize_weight(w)
    assert w_q.dtype == jnp.int8
    recon = w_q.astype(jnp.float32) * scale
    rel = float(jnp.linalg.norm(recon - w) / jnp.linalg.norm(w))
    # symmetric int8 on ~N(0,1): step = absmax/127 ~ 0.03, RMS err
    # step/sqrt(12) -> relative ~1e-2
    assert rel < 0.015


def test_dequant_commutes_with_matmul():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((32, 48)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((5, 32)).astype(np.float32))
    w_q, scale = quantize_weight(w)
    a = dequant_matmul(x, w_q, scale)
    b = x @ (w_q.astype(jnp.float32) * scale)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                               rtol=1e-4)


@pytest.mark.slow
def test_quantized_decoder_logits_close():
    params = dec.init_decoder_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_decoder_params(params)
    rng = np.random.default_rng(2)
    memory = jnp.asarray(rng.standard_normal((2, 6, CFG.d_model), np.float32))

    # step path
    c1 = dec.init_cache(params, CFG, memory, max_len=6)
    c2 = dec.init_cache(qparams, CFG, memory, max_len=6)
    tok = jnp.asarray([1, 1], jnp.int32)
    l1, _ = dec.decoder_step(params, CFG, tok, jnp.int32(0), c1)
    l2, _ = dec.decoder_step(qparams, CFG, tok, jnp.int32(0), c2)
    # logits close in absolute terms (int8 weight rounding only)
    assert float(jnp.max(jnp.abs(l1 - l2))) < 0.15
    assert float(jnp.mean(jnp.abs(l1 - l2))) < 0.03


def test_quantized_greedy_decode_runs():
    params = dec.init_decoder_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_decoder_params(params)
    rng = np.random.default_rng(3)
    memory = jnp.asarray(rng.standard_normal((3, 6, CFG.d_model), np.float32))
    r1 = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    r2 = greedy_decode(qparams, CFG, memory, CFG.max_seq_len)
    # same shapes; token agreement is expected-high but not guaranteed
    assert r2.tokens.shape == r1.tokens.shape
    agree = float(np.mean(np.asarray(r1.tokens) == np.asarray(r2.tokens)))
    assert agree > 0.8


@pytest.mark.slow
def test_engine_quantize_flag():
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, CFG.vocab_size):
        vocab[f"t{i}"] = i
    eng = DecodeEngine(params, state, CFG,
                       DecodeConfig(batch_buckets=(2,)), Tokenizer(vocab),
                       quantize=True)
    assert "w_qkv_q" in eng.params["decoder"]["layers"][0]["self_attn"]
    imgs = np.random.default_rng(0).standard_normal(
        (2, 96, 320, 1)).astype(np.float32)
    outs = eng.predict_with_confidence(imgs)
    assert len(outs) == 2 and all(0 <= c <= 1 for _, c in outs)


def test_quantized_bytes_halved():
    params = dec.init_decoder_params(jax.random.PRNGKey(0), CFG)
    fbytes, qbytes = quantized_bytes(params)
    assert qbytes < 0.6 * fbytes
