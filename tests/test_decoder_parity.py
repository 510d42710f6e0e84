"""Decoder numerics vs torch core nn.TransformerDecoder (the reference's
decoder building block: src/model_swin.py:56-62), and KV-cache step
equivalence vs the full teacher-forced pass."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import ModelConfig
from handwritten_math_ocr_api_tpu.models import decoder as dec
from handwritten_math_ocr_api_tpu.models import layers

torch = pytest.importorskip("torch")

CFG = ModelConfig(
    d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
    num_decoder_layers=2, max_seq_len=20, vocab_size=50, dtype="float32",
)


def _torch_decoder(cfg):
    torch.manual_seed(0)
    layer = torch.nn.TransformerDecoderLayer(
        d_model=cfg.d_model, nhead=cfg.nhead,
        dim_feedforward=cfg.dim_feedforward, dropout=cfg.dropout,
    )
    tdec = torch.nn.TransformerDecoder(layer, num_layers=cfg.num_decoder_layers)
    tdec.eval()
    emb = torch.nn.Embedding(cfg.vocab_size, cfg.d_model)
    pos = torch.nn.Embedding(cfg.max_seq_len, cfg.d_model)
    fc = torch.nn.Linear(cfg.d_model, cfg.vocab_size)
    return tdec, emb, pos, fc


def _port_params(tdec, emb, pos, fc, cfg):
    """Mechanically port torch weights into our param pytree."""
    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    params = {"layers": []}
    for tl in tdec.layers:
        params["layers"].append({
            "self_attn": {
                "w_qkv": t2j(tl.self_attn.in_proj_weight).T,
                "b_qkv": t2j(tl.self_attn.in_proj_bias),
                "w_out": t2j(tl.self_attn.out_proj.weight).T,
                "b_out": t2j(tl.self_attn.out_proj.bias),
            },
            "cross_attn": {
                "w_qkv": t2j(tl.multihead_attn.in_proj_weight).T,
                "b_qkv": t2j(tl.multihead_attn.in_proj_bias),
                "w_out": t2j(tl.multihead_attn.out_proj.weight).T,
                "b_out": t2j(tl.multihead_attn.out_proj.bias),
            },
            "norm1": {"scale": t2j(tl.norm1.weight), "bias": t2j(tl.norm1.bias)},
            "norm2": {"scale": t2j(tl.norm2.weight), "bias": t2j(tl.norm2.bias)},
            "norm3": {"scale": t2j(tl.norm3.weight), "bias": t2j(tl.norm3.bias)},
            "ffn": {
                "fc1": {"w": t2j(tl.linear1.weight).T, "b": t2j(tl.linear1.bias)},
                "fc2": {"w": t2j(tl.linear2.weight).T, "b": t2j(tl.linear2.bias)},
            },
        })
    params["embedding"] = {"table": t2j(emb.weight)}
    params["pos"] = {"table": t2j(pos.weight)}
    params["fc_out"] = {"w": t2j(fc.weight).T, "b": t2j(fc.bias)}
    return params


def _torch_forward(tdec, emb, pos, fc, memory_np, ids_np, cfg):
    with torch.no_grad():
        ids = torch.tensor(ids_np)
        mem = torch.tensor(memory_np)
        L = ids.shape[1]
        x = emb(ids) + pos(torch.arange(L))[None]
        mask = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
        out = tdec(x.permute(1, 0, 2), mem.permute(1, 0, 2), tgt_mask=mask)
        return fc(out.permute(1, 0, 2)).numpy()


def test_decoder_matches_torch():
    tdec, emb, pos, fc = _torch_decoder(CFG)
    params = _port_params(tdec, emb, pos, fc, CFG)
    rng = np.random.default_rng(0)
    B, L, S = 3, 7, 10
    memory = rng.standard_normal((B, S, CFG.d_model), dtype=np.float32)
    ids = rng.integers(0, CFG.vocab_size, (B, L)).astype(np.int64)

    ours = dec.decoder_forward(params, CFG, jnp.asarray(memory),
                               jnp.asarray(ids))
    theirs = _torch_forward(tdec, emb, pos, fc, memory, ids, CFG)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_kv_cache_step_equals_full_forward():
    key = jax.random.PRNGKey(0)
    params = dec.init_decoder_params(key, CFG)
    rng = np.random.default_rng(1)
    B, L, S = 2, 9, 10
    memory = jnp.asarray(rng.standard_normal((B, S, CFG.d_model), np.float32))
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, L)))

    full = dec.decoder_forward(params, CFG, memory, ids)  # (B, L, V)

    cache = dec.init_cache(params, CFG, memory, max_len=L)
    step_logits = []
    for t in range(L):
        logits, cache = dec.decoder_step(
            params, CFG, ids[:, t], jnp.int32(t), cache)
        step_logits.append(logits)
    stepped = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               atol=2e-5, rtol=1e-4)


def test_causal_mask_blocks_future():
    """Changing a future token must not change past logits."""
    key = jax.random.PRNGKey(0)
    params = dec.init_decoder_params(key, CFG)
    rng = np.random.default_rng(2)
    memory = jnp.asarray(rng.standard_normal((1, 5, CFG.d_model), np.float32))
    ids = jnp.asarray([[1, 2, 3, 4, 5]])
    ids2 = ids.at[0, 4].set(7)
    a = dec.decoder_forward(params, CFG, memory, ids)
    b = dec.decoder_forward(params, CFG, memory, ids2)
    np.testing.assert_allclose(np.asarray(a[:, :4]), np.asarray(b[:, :4]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(a[:, 4]), np.asarray(b[:, 4]))
