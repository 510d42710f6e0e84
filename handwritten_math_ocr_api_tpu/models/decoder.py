"""Transformer decoder with torch semantics + TPU-native KV-cached decode.

Architecture (reference: src/model_swin.py:49-88): token embedding + learned
positional embedding (max_seq_len entries), N post-norm decoder layers
(self-attn -> add & LN, cross-attn -> add & LN, relu-FFN -> add & LN — the
``nn.TransformerDecoderLayer`` default ordering), then a vocab projection.
No embedding scaling, no final decoder LN (torch's TransformerDecoder is
constructed with norm=None).

Two apply paths:
- ``decoder_forward``: full-sequence teacher-forced pass (training/eval);
- ``init_cache`` + ``decoder_step``: single-token step against a KV cache
  for autoregressive decode. Cross-attention K/V are computed once from the
  encoder memory at cache init (the reference re-ran the full decoder — and
  in serving, the full *encoder* — every generated token:
  app/src/im2latex.py:26-27, src/inference.py:14-25).

Cache layout: per layer ``k``/``v`` of shape (B, H, T_max, Dh) so decode
attention is a (1, T) row against resident keys; time is the
second-to-last axis, aligned with TPU sublanes.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from . import layers
from .layers import Array

Cache = Dict[str, Array]


def init_decoder_params(key, cfg: ModelConfig):
    keys = jax.random.split(key, cfg.num_decoder_layers + 3)
    layers_p = []
    for i in range(cfg.num_decoder_layers):
        k1, k2, k3 = jax.random.split(keys[i], 3)
        layers_p.append({
            # self-attention honors nhead_kv (MQA/GQA; default = MHA,
            # exact reference parity); cross-attention stays full MHA —
            # its K/V are precomputed once and tiny
            "self_attn": layers.mha_init(k1, cfg.d_model,
                                         kv_dim=cfg.kv_dim),
            "cross_attn": layers.mha_init(k2, cfg.d_model),
            "norm1": layers.layer_norm_init(cfg.d_model),
            "norm2": layers.layer_norm_init(cfg.d_model),
            "norm3": layers.layer_norm_init(cfg.d_model),
            "ffn": layers.mlp_init(k3, cfg.d_model, cfg.dim_feedforward),
        })
    return {
        "embedding": layers.embedding_init(keys[-3], cfg.vocab_size, cfg.d_model),
        "pos": layers.embedding_init(keys[-2], cfg.max_seq_len, cfg.d_model),
        "layers": layers_p,
        "fc_out": layers.linear_init(keys[-1], cfg.d_model, cfg.vocab_size),
    }


def _embed(params, tgt_ids: Array, positions: Array, dtype) -> Array:
    tok = layers.embedding(params["embedding"], tgt_ids)
    pos = layers.embedding(params["pos"], positions)
    return (tok + pos).astype(dtype)


def _layer_forward(p, x: Array, memory: Array, nhead: int, self_mask: Array,
                   *, dropout_rate: float = 0.0, rng=None,
                   deterministic: bool = True) -> Array:
    """Post-norm decoder layer, torch ordering."""
    keys = [None] * 4
    if rng is not None and not deterministic:
        keys = list(jax.random.split(rng, 4))
    sa = layers.mha(p["self_attn"], x, x, nhead, self_mask,
                    deterministic=deterministic)
    x = layers.layer_norm(p["norm1"], x + layers.dropout(
        keys[0], sa, dropout_rate, deterministic))
    ca = layers.mha(p["cross_attn"], x, memory, nhead,
                    deterministic=deterministic)
    x = layers.layer_norm(p["norm2"], x + layers.dropout(
        keys[1], ca, dropout_rate, deterministic))
    ff = layers.mlp(p["ffn"], x, activation=jax.nn.relu,
                    dropout_rate=0.0 if deterministic else dropout_rate,
                    dropout_key=keys[2], deterministic=deterministic)
    x = layers.layer_norm(p["norm3"], x + layers.dropout(
        keys[3], ff, dropout_rate, deterministic))
    return x


def decoder_forward(params, cfg: ModelConfig, memory: Array, tgt_ids: Array,
                    *, deterministic: bool = True, rng=None) -> Array:
    """Teacher-forced full pass. memory: (B, L_enc, D); tgt_ids: (B, L).

    Returns logits (B, L, vocab). Caller slices captions[:, :-1] as in the
    reference (src/model_swin.py:100).
    """
    B, L = tgt_ids.shape
    dtype = jnp.dtype(cfg.dtype)
    positions = jnp.arange(L)[None, :]
    x = _embed(params, tgt_ids, positions, dtype)
    memory = memory.astype(dtype)
    mask = layers.causal_mask(L)
    for i, p in enumerate(params["layers"]):
        lrng = jax.random.fold_in(rng, i) if rng is not None else None
        x = _layer_forward(p, x, memory, cfg.nhead, mask,
                           dropout_rate=cfg.dropout, rng=lrng,
                           deterministic=deterministic)
    return layers.linear(params["fc_out"], x.astype(jnp.float32))


# ---------------------------------------------------------------------------
# KV-cached autoregressive path
# ---------------------------------------------------------------------------

def _proj_qkv(p, x: Array, part: str) -> Array:
    d = x.shape[-1]
    lo = {"q": 0, "k": d, "v": 2 * d}[part]
    if "w_qkv_q" in p:  # int8 weight-only path (ops/quant.py)
        from ..ops.quant import dequant_matmul

        y = dequant_matmul(x, p["w_qkv_q"][:, lo:lo + d],
                           p["w_qkv_scale"][lo:lo + d])
        return y + p["b_qkv"][lo:lo + d].astype(x.dtype)
    w = p["w_qkv"][:, lo:lo + d].astype(x.dtype)
    b = p["b_qkv"][lo:lo + d].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype) + b


def _proj_qkv_packed(p, x: Array) -> Tuple[Array, Array, Array]:
    """One (D, D+2*kv_dim) matmul instead of three — launch-bound decode
    steps care. kv_dim < D for MQA/GQA self-attention."""
    d = x.shape[-1]
    b = p["b_qkv"].astype(x.dtype)
    if "w_qkv_q" in p:
        from ..ops.quant import dequant_matmul

        qkv = dequant_matmul(x, p["w_qkv_q"], p["w_qkv_scale"]) + b
        total = p["w_qkv_q"].shape[1]
    else:
        w = p["w_qkv"].astype(x.dtype)
        qkv = jnp.dot(x, w, preferred_element_type=x.dtype) + b
        total = w.shape[1]
    kvd = (total - d) // 2
    return qkv[..., :d], qkv[..., d:d + kvd], qkv[..., d + kvd:]


def _out_proj(p, x: Array) -> Array:
    if "w_out_q" in p:
        return layers.linear({"w_q": p["w_out_q"],
                              "w_scale": p["w_out_scale"],
                              "b": p["b_out"]}, x)
    return layers.linear({"w": p["w_out"], "b": p["b_out"]}, x)


def init_cache(params, cfg: ModelConfig, memory: Array,
               max_len: Optional[int] = None) -> Cache:
    """Build the decode cache: empty self-attn K/V rings + precomputed
    cross-attn K/V for every layer. memory: (B, L_enc, D)."""
    B = memory.shape[0]
    T = max_len or cfg.max_seq_len
    dtype = jnp.dtype(cfg.dtype)
    memory = memory.astype(dtype)
    nh, dh = cfg.nhead, cfg.head_dim
    cache: Cache = {}
    for i, p in enumerate(params["layers"]):
        ck = layers.split_heads(_proj_qkv(p["cross_attn"], memory, "k"), nh)
        cv = layers.split_heads(_proj_qkv(p["cross_attn"], memory, "v"), nh)
        cache[f"cross_k_{i}"] = ck  # (B, H, L_enc, Dh)
        cache[f"cross_v_{i}"] = cv
        # self cache holds kv_heads heads: nhead_kv < nhead (MQA/GQA)
        # shrinks the dominant per-step HBM stream by nhead/nhead_kv
        cache[f"self_k_{i}"] = jnp.zeros((B, cfg.kv_heads, T, dh), dtype)
        cache[f"self_v_{i}"] = jnp.zeros((B, cfg.kv_heads, T, dh), dtype)
    return cache


def decoder_step(params, cfg: ModelConfig, tok_ids: Array, pos: Array,
                 cache: Cache, *, use_pallas: bool = False
                 ) -> Tuple[Array, Cache]:
    """One decode step. tok_ids: (B,) int32; pos: scalar int32 step index.

    Returns (logits (B, vocab) f32, updated cache). Functionally identical
    to running ``decoder_forward`` on the full prefix and taking the last
    position (verified by tests), but O(T) instead of O(T^2) per token.
    """
    dtype = jnp.dtype(cfg.dtype)
    B = tok_ids.shape[0]
    nh = cfg.nhead
    x = _embed(params, tok_ids[:, None], pos[None, None], dtype)  # (B, 1, D)

    T = cache["self_k_0"].shape[2]
    # additive mask over cache slots: valid iff slot <= pos
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T), 3)
    self_mask = jnp.where(slot_ids <= pos, 0.0, -jnp.inf).astype(jnp.float32)

    new_cache = dict(cache)
    for i, p in enumerate(params["layers"]):
        # --- self-attention against the cache ---
        sp = p["self_attn"]
        qp, kp, vp = _proj_qkv_packed(sp, x)
        q = layers.split_heads(qp, nh)                          # (B,H,1,Dh)
        k_new = layers.split_heads(kp, cfg.kv_heads)
        v_new = layers.split_heads(vp, cfg.kv_heads)
        if use_pallas and cfg.kv_heads == nh:
            # fused append+attention, cache updated in place. MHA only:
            # the kernel assumes H == Hkv, so MQA/GQA configs take the
            # grouped jnp path below instead of dying in a reshape
            from ..ops.cache_attention import cache_append_attention

            sa, k, v = cache_append_attention(
                q, k_new, v_new, cache[f"self_k_{i}"],
                cache[f"self_v_{i}"], pos)
        else:
            k = jax.lax.dynamic_update_slice(
                cache[f"self_k_{i}"], k_new, (0, 0, pos, 0))
            v = jax.lax.dynamic_update_slice(
                cache[f"self_v_{i}"], v_new, (0, 0, pos, 0))
            sa = layers.grouped_attention(q, k, v, self_mask, nh)
        new_cache[f"self_k_{i}"] = k
        new_cache[f"self_v_{i}"] = v
        sa = layers.merge_heads(sa)
        sa = _out_proj(sp, sa)
        x = layers.layer_norm(p["norm1"], x + sa)

        # --- cross-attention against precomputed memory K/V ---
        cp = p["cross_attn"]
        qc = layers.split_heads(_proj_qkv(cp, x, "q"), nh)
        ca = layers.attention(qc, cache[f"cross_k_{i}"], cache[f"cross_v_{i}"])
        ca = layers.merge_heads(ca)
        ca = _out_proj(cp, ca)
        x = layers.layer_norm(p["norm2"], x + ca)

        # --- FFN ---
        ff = layers.mlp(p["ffn"], x, activation=jax.nn.relu)
        x = layers.layer_norm(p["norm3"], x + ff)

        cache = new_cache  # subsequent layers read the updated dict

    logits = layers.linear(params["fc_out"], x.astype(jnp.float32))
    return logits[:, 0, :], new_cache


def decoder_step_ragged(params, cfg: ModelConfig, tok_ids: Array,
                        pos: Array, cache: Cache) -> Tuple[Array, Cache]:
    """One decode step with PER-SAMPLE positions (continuous batching).

    tok_ids: (B,) int32; pos: (B,) int32 — each row writes its K/V at its
    own cache slot and attends to its own prefix. Semantics per row are
    identical to ``decoder_step`` at that row's position (tests assert).
    """
    dtype = jnp.dtype(cfg.dtype)
    B = tok_ids.shape[0]
    nh = cfg.nhead
    x = _embed(params, tok_ids[:, None], pos[:, None], dtype)  # (B, 1, D)

    T = cache["self_k_0"].shape[2]
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1, T), 3)
    self_mask = jnp.where(slot_ids <= pos[:, None, None, None],
                          0.0, -jnp.inf).astype(jnp.float32)
    def row_update(c, new, p):
        # c: (H, T, Dh); new: (H, 1, Dh); p: scalar
        return jax.lax.dynamic_update_slice(c, new, (0, p, 0))

    new_cache = dict(cache)
    for i, p in enumerate(params["layers"]):
        sp = p["self_attn"]
        qp, kp, vp = _proj_qkv_packed(sp, x)
        q = layers.split_heads(qp, nh)
        k_new = layers.split_heads(kp, cfg.kv_heads)
        v_new = layers.split_heads(vp, cfg.kv_heads)
        k = jax.vmap(row_update)(cache[f"self_k_{i}"], k_new, pos)
        v = jax.vmap(row_update)(cache[f"self_v_{i}"], v_new, pos)
        new_cache[f"self_k_{i}"] = k
        new_cache[f"self_v_{i}"] = v
        sa = layers.grouped_attention(q, k, v, self_mask, nh)
        sa = layers.merge_heads(sa)
        sa = _out_proj(sp, sa)
        x = layers.layer_norm(p["norm1"], x + sa)

        cp = p["cross_attn"]
        qc = layers.split_heads(_proj_qkv(cp, x, "q"), nh)
        ca = layers.attention(qc, cache[f"cross_k_{i}"], cache[f"cross_v_{i}"])
        ca = layers.merge_heads(ca)
        ca = _out_proj(cp, ca)
        x = layers.layer_norm(p["norm2"], x + ca)

        ff = layers.mlp(p["ffn"], x, activation=jax.nn.relu)
        x = layers.layer_norm(p["norm3"], x + ff)
        cache = new_cache

    logits = layers.linear(params["fc_out"], x.astype(jnp.float32))
    return logits[:, 0, :], new_cache


def project_cross_kv(params, cfg: ModelConfig, memory: Array):
    """Per-layer cross-attention K/V for ``memory`` (B, L_enc, D) without
    allocating self-attn cache — used by the continuous-batching engine to
    insert new requests into existing slots."""
    dtype = jnp.dtype(cfg.dtype)
    memory = memory.astype(dtype)
    nh = cfg.nhead
    out = {}
    for i, p in enumerate(params["layers"]):
        out[f"cross_k_{i}"] = layers.split_heads(
            _proj_qkv(p["cross_attn"], memory, "k"), nh)
        out[f"cross_v_{i}"] = layers.split_heads(
            _proj_qkv(p["cross_attn"], memory, "v"), nh)
    return out
