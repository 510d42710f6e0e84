"""Multi-chip serving path: batched decode sharded over the mesh 'data'
axis must reproduce single-device results exactly (the v5e-4 serving
target, validated on the 8-device virtual CPU mesh)."""

import numpy as np
import pytest

import jax

from handwritten_math_ocr_api_tpu.core.config import (
    DecodeConfig, ModelConfig, SwinConfig,
)
from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
from handwritten_math_ocr_api_tpu.models.model import init_model
from handwritten_math_ocr_api_tpu.parallel import mesh as mesh_lib

CFG = ModelConfig(
    d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
    num_decoder_layers=2, max_seq_len=10, vocab_size=20, dtype="float32",
    swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                    window_size=4, stochastic_depth=0.0),
)


pytestmark = pytest.mark.slow  # compile-heavy


def _tok():
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, CFG.vocab_size):
        vocab[f"t{i}"] = i
    return Tokenizer(vocab)


@pytest.mark.parametrize("data_axis", [4, 8])
def test_sharded_decode_matches_single_device(data_axis):
    assert len(jax.devices()) == 8
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    tok = _tok()
    rng = np.random.default_rng(0)
    images = rng.standard_normal((10, 96, 320, 1)).astype(np.float32)

    single = DecodeEngine(params, state, CFG,
                          DecodeConfig(batch_buckets=(16,)), tok)
    want = single.predict_with_confidence(images)

    mesh = mesh_lib.make_mesh(data=data_axis, tensor=1,
                              devices=jax.devices()[:data_axis])
    sharded = DecodeEngine(params, state, CFG,
                           DecodeConfig(batch_buckets=(16,)), tok,
                           mesh=mesh)
    got = sharded.predict_with_confidence(images)
    for (wl, wc), (gl, gc) in zip(want, got):
        assert wl == gl
        assert abs(wc - gc) < 1e-4


def test_sharded_beam_matches_single_device():
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    tok = _tok()
    rng = np.random.default_rng(1)
    images = rng.standard_normal((4, 96, 320, 1)).astype(np.float32)

    single = DecodeEngine(params, state, CFG,
                          DecodeConfig(batch_buckets=(4,)), tok)
    want = single.predict_batch(images, beam_size=3)

    mesh = mesh_lib.make_mesh(data=4, tensor=1, devices=jax.devices()[:4])
    sharded = DecodeEngine(params, state, CFG,
                           DecodeConfig(batch_buckets=(4,)), tok, mesh=mesh)
    got = sharded.predict_batch(images, beam_size=3)
    assert want == got


def test_bucket_rounding_to_mesh_multiple():
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    mesh = mesh_lib.make_mesh(data=4, tensor=1, devices=jax.devices()[:4])
    eng = DecodeEngine(params, state, CFG,
                       DecodeConfig(batch_buckets=(1, 2, 6)), _tok(),
                       mesh=mesh)
    # every bucket must be a multiple of the data axis (4)
    assert all(b % 4 == 0 for b in eng.decode_cfg.batch_buckets)
    out = eng.predict_batch(
        np.zeros((3, 96, 320, 1), np.float32))
    assert len(out) == 3
