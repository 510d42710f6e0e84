"""Whole-decode megakernel (v5): full-loop-in-one-kernel equivalence vs
the jnp greedy path (bf16-resident) and the v2 quantized per-step kernel
(int8-resident), interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import ModelConfig
from handwritten_math_ocr_api_tpu.decode.greedy import greedy_decode
from handwritten_math_ocr_api_tpu.models import decoder as dec
from handwritten_math_ocr_api_tpu.ops.whole_decode import (
    build_resident, fused_whole_decode,
)

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


def test_whole_decode_matches_jnp_greedy(setup):
    """bf16(f32)-resident v5 == the XLA greedy loop, token-for-token."""
    params, memory = setup
    want = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    resident = build_resident(params, CFG, quantize=False)
    got = fused_whole_decode(resident, CFG, memory, CFG.max_seq_len,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_allclose(np.asarray(got.logprob_sum),
                               np.asarray(want.logprob_sum),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(got.token_count),
                                  np.asarray(want.token_count))
    np.testing.assert_array_equal(np.asarray(got.lengths),
                                  np.asarray(want.lengths))


def test_whole_decode_quantized_close(setup):
    """int8-resident v5 vs the f32 jnp path: same early tokens, close
    scores (quantization shifts logits slightly; greedy is robust)."""
    params, memory = setup
    want = greedy_decode(params, CFG, memory, CFG.max_seq_len)
    resident = build_resident(params, CFG, quantize=True)
    got = fused_whole_decode(resident, CFG, memory, CFG.max_seq_len,
                             interpret=True)
    agree = (np.asarray(got.tokens) == np.asarray(want.tokens)).mean()
    assert agree >= 0.7, f"token agreement {agree}"


def test_whole_decode_eos_semantics(setup):
    """Rows that emit <eos> keep emitting PAD; lp/count freeze."""
    params, memory = setup
    resident = build_resident(params, CFG, quantize=False)
    got = fused_whole_decode(resident, CFG, memory, CFG.max_seq_len,
                             interpret=True)
    toks = np.asarray(got.tokens)
    from handwritten_math_ocr_api_tpu.core.config import EOS_ID, PAD_ID
    for b in range(toks.shape[0]):
        row = toks[b]
        eos_pos = np.where(row == EOS_ID)[0]
        if eos_pos.size:
            assert (row[eos_pos[0] + 1:] == PAD_ID).all()
        assert got.lengths[b] == (row != PAD_ID).sum()
