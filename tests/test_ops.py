"""Pallas kernel equivalence tests (interpret mode on CPU): each kernel
must match its jnp reference implementation bit-for-bit-ish."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import ModelConfig, SwinConfig
from handwritten_math_ocr_api_tpu.models import layers, swin
from handwritten_math_ocr_api_tpu.ops.decode_attention import decode_attention
from handwritten_math_ocr_api_tpu.ops.window_attention import (
    fused_window_attention, window_attention_core,
)


def test_decode_attention_matches_jnp():
    rng = np.random.default_rng(0)
    B, H, T, Dh = 3, 4, 12, 32
    q = jnp.asarray(rng.standard_normal((B, H, 1, Dh), np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, Dh), np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, Dh), np.float32))
    for pos in [0, 5, T - 1]:
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T), 3)
        mask = jnp.where(slot <= pos, 0.0, -jnp.inf)
        ref = layers.attention(q, k, v, mask)
        got = decode_attention(q, k, v, jnp.int32(pos), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_decode_attention_inside_decoder_step():
    """use_pallas decoder step == jnp decoder step."""
    from handwritten_math_ocr_api_tpu.models import decoder as dec

    cfg = ModelConfig(d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
                      num_decoder_layers=2, max_seq_len=10, vocab_size=20,
                      dtype="float32")
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    memory = jnp.asarray(rng.standard_normal((2, 6, 32), np.float32))
    ids = jnp.asarray(rng.integers(0, 20, (2, 5)))

    c1 = dec.init_cache(params, cfg, memory, max_len=5)
    c2 = dec.init_cache(params, cfg, memory, max_len=5)
    for t in range(5):
        l1, c1 = dec.decoder_step(params, cfg, ids[:, t], jnp.int32(t), c1,
                                  use_pallas=False)
        l2, c2 = dec.decoder_step(params, cfg, ids[:, t], jnp.int32(t), c2,
                                  use_pallas=True)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=2e-5, rtol=1e-4)


def test_cache_append_attention_matches_jnp():
    from handwritten_math_ocr_api_tpu.ops.cache_attention import (
        cache_append_attention,
    )

    rng = np.random.default_rng(3)
    B, H, T, Dh = 2, 3, 9, 32
    k_cache = jnp.asarray(rng.standard_normal((B, H, T, Dh), np.float32))
    v_cache = jnp.asarray(rng.standard_normal((B, H, T, Dh), np.float32))
    for pos in [0, 4, T - 1]:
        q = jnp.asarray(rng.standard_normal((B, H, 1, Dh), np.float32))
        kn = jnp.asarray(rng.standard_normal((B, H, 1, Dh), np.float32))
        vn = jnp.asarray(rng.standard_normal((B, H, 1, Dh), np.float32))
        # jnp reference: update then masked attention
        k_ref = jax.lax.dynamic_update_slice(k_cache, kn, (0, 0, pos, 0))
        v_ref = jax.lax.dynamic_update_slice(v_cache, vn, (0, 0, pos, 0))
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T), 3)
        mask = jnp.where(slot <= pos, 0.0, -jnp.inf)
        want = layers.attention(q, k_ref, v_ref, mask)

        out, k_out, v_out = cache_append_attention(
            q, kn, vn, k_cache, v_cache, jnp.int32(pos), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(k_out), np.asarray(k_ref))
        np.testing.assert_array_equal(np.asarray(v_out), np.asarray(v_ref))


def test_window_attention_core_matches_jnp():
    rng = np.random.default_rng(0)
    B, nW, nh, N, dh = 2, 3, 2, 16, 32
    q = jnp.asarray(rng.standard_normal((B, nW, nh, N, dh), np.float32))
    k = jnp.asarray(rng.standard_normal((B, nW, nh, N, dh), np.float32))
    v = jnp.asarray(rng.standard_normal((B, nW, nh, N, dh), np.float32))
    mask = jnp.asarray(
        rng.standard_normal((nW, nh, N, N), np.float32))
    ref = layers.attention(q, k, v, mask[None])
    got = window_attention_core(q, k, v, mask, nh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fused_window_attention_in_swin_block():
    """Full swin encoder with use_pallas must match the jnp path."""
    cfg = SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                     window_size=4, stochastic_depth=0.0)
    params = swin.init_swin_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 1))
    ref = swin.swin_apply(params, x, cfg, use_pallas=False)
    got = swin.swin_apply(params, x, cfg, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_patch_merging_matches_jnp():
    from handwritten_math_ocr_api_tpu.ops.patch_merging import (
        fused_patch_merging,
    )

    rng = np.random.default_rng(5)
    B, H, W, C = 2, 6, 10, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C), np.float32))
    p = {
        "norm": {"scale": jnp.asarray(rng.standard_normal(4 * C), jnp.float32),
                 "bias": jnp.asarray(rng.standard_normal(4 * C), jnp.float32)},
        "reduction": {"w": jnp.asarray(
            rng.standard_normal((4 * C, 2 * C)), jnp.float32)},
    }
    want = swin.patch_merging(p, x, use_pallas=False)
    got = fused_patch_merging(p, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_window_attention_with_shift_mask():
    """Shifted block (real -100 region mask) through the kernel."""
    p = swin._block_init(jax.random.PRNGKey(0), 8, 2, 4, 4.0)["attn"]
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8))
    ref = swin.window_attention(p, x, 4, 2, 2, use_pallas=False)
    got = swin.window_attention(p, x, 4, 2, 2, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
