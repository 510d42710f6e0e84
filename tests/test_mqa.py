"""Multi-/grouped-query attention (nhead_kv): cache shapes, step-vs-full
equivalence, and train-step smoke. MQA shrinks the decode self-KV cache
(the dominant per-step HBM stream) by nhead/nhead_kv; default
nhead_kv=None is exact MHA reference parity (asserted by the whole
existing suite)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import ModelConfig
from handwritten_math_ocr_api_tpu.decode.greedy import greedy_decode
from handwritten_math_ocr_api_tpu.models import decoder as dec


def _cfg(nhead_kv):
    return ModelConfig(
        d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=2, max_seq_len=10, vocab_size=20,
        dtype="float32", nhead_kv=nhead_kv,
    )


@pytest.mark.parametrize("nhead_kv", [1, 2])
def test_param_and_cache_shapes(nhead_kv):
    cfg = _cfg(nhead_kv)
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    w = params["layers"][0]["self_attn"]["w_qkv"]
    assert w.shape == (32, 32 + 2 * nhead_kv * cfg.head_dim)
    # cross attention unchanged (full MHA)
    assert params["layers"][0]["cross_attn"]["w_qkv"].shape == (32, 96)
    memory = jnp.zeros((3, 6, 32))
    cache = dec.init_cache(params, cfg, memory, max_len=10)
    assert cache["self_k_0"].shape == (3, nhead_kv, 10, cfg.head_dim)
    assert cache["cross_k_0"].shape == (3, 4, 6, cfg.head_dim)


@pytest.mark.parametrize("nhead_kv", [1, 2])
def test_step_matches_full_forward(nhead_kv):
    """Cached decode step == teacher-forced forward on the same prefix."""
    cfg = _cfg(nhead_kv)
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)

    full = dec.decoder_forward(params, cfg, memory, ids)  # (2, 6, V)

    cache = dec.init_cache(params, cfg, memory, max_len=10)
    for t in range(6):
        step_logits, cache = dec.decoder_step(
            params, cfg, ids[:, t], jnp.int32(t), cache)
        np.testing.assert_allclose(np.asarray(step_logits),
                                   np.asarray(full[:, t]),
                                   atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("nhead_kv", [1, 2])
def test_ragged_step_matches_uniform(nhead_kv):
    """Ragged step at uniform positions == plain step (MQA/GQA)."""
    cfg = _cfg(nhead_kv)
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    memory = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2,)), jnp.int32)
    c1 = dec.init_cache(params, cfg, memory, max_len=10)
    c2 = dec.init_cache(params, cfg, memory, max_len=10)
    l1, _ = dec.decoder_step(params, cfg, toks, jnp.int32(0), c1)
    l2, _ = dec.decoder_step_ragged(params, cfg, toks,
                                    jnp.zeros((2,), jnp.int32), c2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=2e-5, rtol=1e-5)


def test_greedy_decode_runs_mqa():
    cfg = _cfg(1)
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    memory = jnp.asarray(rng.standard_normal((3, 6, 32)), jnp.float32)
    res = greedy_decode(params, cfg, memory, cfg.max_seq_len)
    assert res.tokens.shape == (3, cfg.max_seq_len)
    assert np.isfinite(np.asarray(res.logprob_sum)).all()


@pytest.mark.slow
def test_train_step_learns_mqa():
    """A few optimization steps reduce loss on a fixed tiny batch."""
    from handwritten_math_ocr_api_tpu.core.config import TrainConfig
    from handwritten_math_ocr_api_tpu.train.step import (
        create_train_state, make_train_step,
    )

    cfg = ModelConfig(
        d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=2, max_seq_len=10, vocab_size=20,
        dtype="float32", nhead_kv=1, encoder="resnet18",
    )
    tc = TrainConfig(learning_rate=1e-3)
    state, optimizer = create_train_state(jax.random.PRNGKey(0), cfg, tc)
    step = make_train_step(cfg, tc, optimizer)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((2, 96, 320, 1)), jnp.float32)
    caps = jnp.asarray(rng.integers(4, 20, (2, 10)), jnp.int32)
    losses = []
    for i in range(4):
        state, metrics = step(state, images, caps, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_fused_v2_matches_xla_greedy_mqa():
    """Fused v2 kernel with a single shared K/V head == XLA greedy
    (interpret). The kernel replicates the shared head's lanes up to D;
    that mapping is head-order-correct only at nhead_kv=1 (GQA raises)."""
    from handwritten_math_ocr_api_tpu.decode.fused import greedy_decode_fused
    from handwritten_math_ocr_api_tpu.ops.fused_step import build_stacked

    cfg = _cfg(1)
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    stacked = build_stacked(params, cfg)
    rng = np.random.default_rng(3)
    memory = jnp.asarray(rng.standard_normal((3, 6, 32)), jnp.float32)
    want = greedy_decode(params, cfg, memory, cfg.max_seq_len)
    got = greedy_decode_fused(params, stacked, cfg, memory,
                              cfg.max_seq_len, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_allclose(np.asarray(got.logprob_sum),
                               np.asarray(want.logprob_sum),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("variant,nhead_kv", [("v1", 1), ("v2", 2)])
def test_fused_variants_reject_unsupported_kv(variant, nhead_kv):
    from handwritten_math_ocr_api_tpu.decode.fused import greedy_decode_fused
    from handwritten_math_ocr_api_tpu.ops.fused_step import build_stacked

    cfg = _cfg(nhead_kv)
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    stacked = build_stacked(params, cfg)
    memory = jnp.zeros((2, 6, 32))
    with pytest.raises(NotImplementedError):
        greedy_decode_fused(params, stacked, cfg, memory, 8,
                            interpret=True, variant=variant)


def test_gqa_convert_from_mha(tmp_path):
    """MHA -> GQA mean-pool conversion (train/gqa_convert.py): pooling to
    nhead groups is the identity (logits bit-equal), pooling to fewer
    groups loads and runs at the converted kv_heads, and the EMA shadow
    is pooled alongside."""
    import jax

    from handwritten_math_ocr_api_tpu.core.config import (
        ModelConfig,
        TrainConfig,
    )
    from handwritten_math_ocr_api_tpu.core.tokenizer import save_vocab
    from handwritten_math_ocr_api_tpu.data.synthetic import grammar_vocab
    from handwritten_math_ocr_api_tpu.models import model as model_mod
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from handwritten_math_ocr_api_tpu.train.gqa_convert import (
        convert_to_gqa,
    )
    from handwritten_math_ocr_api_tpu.train.step import create_train_state

    vocab = grammar_vocab()
    mc = ModelConfig(vocab_size=len(vocab), d_model=32, nhead=4,
                     num_decoder_layers=2, dim_feedforward=64,
                     encoder="resnet18", max_seq_len=16, img_h=32,
                     img_w=64)
    state, _ = create_train_state(jax.random.PRNGKey(1), mc,
                                  TrainConfig(ema_decay=0.999))
    src = tmp_path / "src"
    src.mkdir()
    save_vocab(vocab, str(src / "vocab.json"))
    save_checkpoint(str(src), "best_model", state, epoch=3, metric=0.5)

    imgs = np.zeros((1, 32, 64, 1), np.float32)
    caps = np.array([[1, 5, 6, 2] + [0] * 12], np.int32)
    ref_logits, _ = model_mod.forward(state.params, state.model_state,
                                      mc, imgs, caps)

    # identity case: nhead_kv == nhead (groups of 1)
    path4, cfg4 = convert_to_gqa(str(src), "best_model",
                                 str(tmp_path / "g4"), mc, 4)
    t4, _ = create_train_state(jax.random.PRNGKey(0), cfg4,
                               TrainConfig(ema_decay=0.999))
    s4, _ = load_checkpoint(str(tmp_path / "g4"), "best_model", t4,
                            params_only=True)
    l4, _ = model_mod.forward(s4.params, s4.model_state, cfg4, imgs, caps)
    np.testing.assert_array_equal(np.asarray(ref_logits), np.asarray(l4))

    # real pooling: nhead_kv = 2
    path2, cfg2 = convert_to_gqa(str(src), "best_model",
                                 str(tmp_path / "g2"), mc, 2)
    assert cfg2.kv_heads == 2
    t2, _ = create_train_state(jax.random.PRNGKey(0), cfg2,
                               TrainConfig(ema_decay=0.999))
    s2, meta2 = load_checkpoint(str(tmp_path / "g2"), "best_model", t2,
                                params_only=True)
    assert meta2["epoch"] == 0
    w = np.asarray(s2.params["decoder"]["layers"][0]["self_attn"]["w_qkv"])
    assert w.shape[1] == mc.d_model + 2 * 2 * mc.head_dim
    l2, _ = model_mod.forward(s2.params, s2.model_state, cfg2, imgs, caps)
    assert np.isfinite(np.asarray(l2)).all()
    assert s2.ema_params is not None
    we = np.asarray(
        s2.ema_params["decoder"]["layers"][0]["self_attn"]["w_qkv"])
    assert we.shape == w.shape

    with pytest.raises(ValueError):
        convert_to_gqa(str(src), "best_model", str(tmp_path / "g3"),
                       mc, 3)
