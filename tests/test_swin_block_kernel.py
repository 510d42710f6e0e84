"""Equivalence tests: ops/swin_block.py whole-block Pallas megakernel vs
the jnp reference path (models/swin.py::swin_block, deterministic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.models.swin import (
    _block_init, swin_block,
)
from handwritten_math_ocr_api_tpu.ops.swin_block import (
    fits_vmem, fused_swin_block,
)


pytestmark = pytest.mark.slow  # compile-heavy


def _mk(dim, heads, ws, key=0):
    return _block_init(jax.random.PRNGKey(key), dim, heads, ws, 4.0)


@pytest.mark.parametrize("shift", [0, 3])
def test_block_kernel_matches_jnp(shift):
    """Stage-1-like shape: (B, 24, 80, 96), ws=7 — pads to 28x84,
    12 windows per band, 4 bands; shift=3 exercises roll + masks."""
    ws, heads, dim = 7, 3, 96
    p = _mk(dim, heads, ws)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 24, 80, dim)),
        jnp.float32)
    ref = swin_block(p, x, ws, shift, heads, 4.0)
    got = fused_swin_block(p, x, ws, shift, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_block_kernel_small_spatial_no_shift_clamp():
    """Stage-4-like spatial (3x10 < ws): shift clamps to 0 on H, stays
    on W; windows cover the padded plane."""
    ws, heads, dim = 7, 4, 64
    p = _mk(dim, heads, ws, key=1)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 3, 10, dim)),
        jnp.float32)
    ref = swin_block(p, x, ws, 3, heads, 4.0)
    got = fused_swin_block(p, x, ws, 3, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fits_vmem_gates_stage4():
    # Swin-T stages at 96x320 input: W_pad per stage
    assert fits_vmem(96, 7, 84)
    assert fits_vmem(192, 7, 42)
    assert fits_vmem(384, 7, 21)
    assert not fits_vmem(768, 7, 14)


def test_trunk_with_block_kernel_matches_jnp():
    """Full swin_apply with use_pallas_block=True: stages 1-3 fuse
    (stage 4 auto-falls back via fits_vmem) and match the XLA trunk."""
    from handwritten_math_ocr_api_tpu.core.config import SwinConfig
    from handwritten_math_ocr_api_tpu.models.swin import (
        init_swin_params, swin_apply,
    )
    cfg = SwinConfig(embed_dim=16, depths=(1, 2), num_heads=(2, 4),
                     window_size=4, stochastic_depth=0.0)
    params = init_swin_params(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 32, 48, 1)),
        jnp.float32)
    ref = swin_apply(params, x, cfg)
    got = swin_apply(params, x, cfg, use_pallas_block=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_decode_engine_pallas_encoder_matches():
    """DecodeEngine(pallas_encoder_block=True) produces the same LaTeX
    as the default engine (SERVING_PALLAS_ENCODER wiring)."""
    from handwritten_math_ocr_api_tpu.core.config import (
        ModelConfig, SwinConfig,
    )
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig(
        d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=1, max_seq_len=8, vocab_size=16,
        dtype="float32",
        swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                        window_size=4, stochastic_depth=0.0))
    params, state = init_model(jax.random.PRNGKey(3), cfg)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    tok = Tokenizer(vocab, {v: k for k, v in vocab.items()})
    img = np.random.default_rng(3).standard_normal(
        (2, 96, 320, 1)).astype(np.float32)
    ref = DecodeEngine(params, state, cfg, tokenizer=tok).predict_batch(img)
    got = DecodeEngine(params, state, cfg, tokenizer=tok,
                       pallas_encoder_block=True).predict_batch(img)
    assert [r[0] for r in ref] == [g[0] for g in got]
