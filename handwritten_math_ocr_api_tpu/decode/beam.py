"""Batched beam-search decode with KV cache.

The reference *configured* beam search (beam_size=5, src/config.py:50;
DEFAULT_BEAM_SIZE=3, app/src/config.py:57) but never implemented it — every
decode path is greedy (src/inference.py:5 "Using greedy search for
simplicity"). This module supplies the missing capability, TPU-native:
one ``lax.while_loop`` whole-batch program, beam state gathered with
``take_along_axis``, caches reordered per step (cross-attention K/V are
beam-invariant and are never reordered).

Scoring: sum of per-token log-probs; finished beams extend only with <pad>
at zero added score. Optional GNMT-style length normalization via
``alpha`` (score / length**alpha) applied at candidate ranking time would
change beam dynamics, so it is applied only at final beam selection —
documented, deterministic, and alpha=0 reduces to pure log-prob.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import EOS_ID, ModelConfig, PAD_ID, SOS_ID
from ..models import decoder as decoder_mod
from ..models.layers import Array

NEG_INF = -1.0e9


class BeamResult(NamedTuple):
    tokens: Array   # (B, max_len) best-beam ids, PAD after eos
    scores: Array   # (B,) best-beam total log-prob
    lengths: Array  # (B,)


def _gather_beams(x: Array, beam_idx: Array, B: int, K: int) -> Array:
    """x: (B*K, ...) -> gathered by beam_idx (B, K) -> (B*K, ...).

    Perf note (round-2 A/B on v5e, B=64 K=5): a one-hot batched-matmul
    formulation of this permutation measured IDENTICAL to
    ``take_along_axis`` (2091 vs 2032 ms per batch-64 beam decode), and
    an isolated chained microbench put the full cache reorder at
    ~2.4 ms/step vs ~2.9 ms/step for the decoder step itself — the
    remaining beam cost is XLA's scheduling of the combined while body,
    not the gather lowering. Keeping the simpler formulation."""
    shape = x.shape
    x = x.reshape(B, K, *shape[1:])
    idx = beam_idx.reshape(B, K, *([1] * (x.ndim - 2)))
    x = jnp.take_along_axis(x, idx, axis=1)
    return x.reshape(shape)


def beam_decode(
    params,
    cfg: ModelConfig,
    memory: Array,
    beam_size: int = 5,
    max_len: int | None = None,
    *,
    sos_id: int = SOS_ID,
    eos_id: int = EOS_ID,
    pad_id: int = PAD_ID,
    alpha: float = 0.0,
    use_pallas: bool = False,
) -> BeamResult:
    """memory: (B, L_enc, d_model). jit-safe; beam_size/max_len static."""
    B = memory.shape[0]
    K = beam_size
    T = max_len or cfg.max_seq_len
    V = cfg.vocab_size

    mem_exp = jnp.repeat(memory, K, axis=0)  # (B*K, L_enc, D)
    cache = decoder_mod.init_cache(params, cfg, mem_exp, max_len=T)

    # beam 0 live, others dead so step 0 picks K distinct first tokens
    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), NEG_INF)])[None],
        (B, 1),
    ).astype(jnp.float32)

    state0 = (
        jnp.int32(0),
        jnp.full((B * K,), sos_id, jnp.int32),   # prev token per beam row
        scores0,                                  # (B, K)
        jnp.zeros((B, K), jnp.bool_),             # finished
        jnp.full((B, K, T), pad_id, jnp.int32),   # tokens
        cache,
    )

    def cond(state):
        step, _, _, finished, *_ = state
        return jnp.logical_and(step < T, ~jnp.all(finished))

    def body(state):
        step, prev, scores, finished, tokens, cache = state
        logits, cache = decoder_mod.decoder_step(
            params, cfg, prev, step, cache, use_pallas=use_pallas)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, K, V)

        # finished beams: only pad continuation, zero added score
        pad_only = jnp.full((V,), NEG_INF).at[pad_id].set(0.0)
        cand = jnp.where(finished[:, :, None], pad_only[None, None], logp)
        cand = scores[:, :, None] + cand                      # (B, K, V)

        flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)          # (B, K)
        beam_idx = top_idx // V
        token = (top_idx % V).astype(jnp.int32)

        # reorder beam state
        tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        was_finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        emit = jnp.where(was_finished, pad_id, token)
        tokens = jax.lax.dynamic_update_slice(
            tokens, emit[:, :, None], (0, 0, step))
        finished = was_finished | (token == eos_id)
        scores = top_scores

        new_cache = dict(cache)
        for name, val in cache.items():
            if name.startswith("self_"):
                new_cache[name] = _gather_beams(val, beam_idx, B, K)
        prev = jnp.where(finished, eos_id,
                         jnp.where(was_finished, pad_id, token)).reshape(B * K)
        return (step + 1, prev, scores, finished, tokens, new_cache)

    _, _, scores, finished, tokens, _ = jax.lax.while_loop(cond, body, state0)

    lengths = jnp.sum(tokens != pad_id, axis=-1)  # (B, K), incl. eos
    if alpha > 0.0:
        norm = jnp.power(jnp.maximum(lengths, 1).astype(jnp.float32), alpha)
        final = scores / norm
    else:
        final = scores
    best = jnp.argmax(final, axis=-1)  # (B,)
    best_tokens = jnp.take_along_axis(
        tokens, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    best_lengths = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    return BeamResult(best_tokens, best_scores, best_lengths)


# ---------------------------------------------------------------------------
# Ancestry-indirection variant: no per-step cache reorder
# ---------------------------------------------------------------------------


def _step_indirect(params, cfg: ModelConfig, tok_ids: Array, pos: Array,
                   cache, ancestry: Array, B: int, K: int
                   ) -> Tuple[Array, dict]:
    """One decode step where each beam's self-attention history is resolved
    through an ``ancestry`` table instead of a physically reordered cache.

    tok_ids: (B*K,); ancestry: (B, K, T) int32 — ancestry[b, k, t] is the
    physical row (0..K-1) whose cache entry at position t belongs to beam
    k's history (column ``pos`` must be the identity: rows attend their own
    fresh entry). Row r always writes its fresh K/V at its own row —
    writes never move; reads are steered. Logit semantics are identical to
    ``decoder_step`` on a reorder-maintained cache (tests assert)."""
    from ..models import layers
    from ..models.decoder import (
        _embed, _out_proj, _proj_qkv, _proj_qkv_packed,
    )

    if cfg.kv_heads != cfg.nhead:  # MHA only (grouped KV would need a
        raise NotImplementedError(  # second gather axis)
            "ancestry-indirection beam supports MHA only")
    dtype = jnp.dtype(cfg.dtype)
    nh = cfg.nhead
    x = _embed(params, tok_ids[:, None], pos[None, None], dtype)

    T = cache["self_k_0"].shape[2]
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T), 3)
    self_mask = jnp.where(slot_ids <= pos, 0.0, -jnp.inf).astype(jnp.float32)
    idx = ancestry[:, :, None, :, None]  # (B, K, 1, T, 1)

    new_cache = dict(cache)
    for i, p in enumerate(params["layers"]):
        sp = p["self_attn"]
        qp, kp, vp = _proj_qkv_packed(sp, x)
        q = layers.split_heads(qp, nh)                       # (B*K,H,1,Dh)
        k_new = layers.split_heads(kp, nh)
        v_new = layers.split_heads(vp, nh)
        k = jax.lax.dynamic_update_slice(
            cache[f"self_k_{i}"], k_new, (0, 0, pos, 0))
        v = jax.lax.dynamic_update_slice(
            cache[f"self_v_{i}"], v_new, (0, 0, pos, 0))
        new_cache[f"self_k_{i}"] = k
        new_cache[f"self_v_{i}"] = v
        H, Dh = k.shape[1], k.shape[3]
        k5 = k.reshape(B, K, H, T, Dh)
        v5 = v.reshape(B, K, H, T, Dh)
        # steer reads through ancestry: position t of beam k comes from
        # physical row ancestry[b,k,t]
        k_eff = jnp.take_along_axis(k5, idx, axis=1).reshape(B * K, H, T, Dh)
        v_eff = jnp.take_along_axis(v5, idx, axis=1).reshape(B * K, H, T, Dh)
        sa = layers.attention(q, k_eff, v_eff, self_mask)
        sa = layers.merge_heads(sa)
        sa = _out_proj(sp, sa)
        x = layers.layer_norm(p["norm1"], x + sa)

        cp = p["cross_attn"]
        qc = layers.split_heads(_proj_qkv(cp, x, "q"), nh)
        ca = layers.attention(qc, cache[f"cross_k_{i}"],
                              cache[f"cross_v_{i}"])
        ca = layers.merge_heads(ca)
        ca = _out_proj(cp, ca)
        x = layers.layer_norm(p["norm2"], x + ca)

        ff = layers.mlp(p["ffn"], x, activation=jax.nn.relu)
        x = layers.layer_norm(p["norm3"], x + ff)
        cache = new_cache

    logits = layers.linear(params["fc_out"], x.astype(jnp.float32))
    return logits[:, 0, :], new_cache


def beam_decode_indirect(
    params,
    cfg: ModelConfig,
    memory: Array,
    beam_size: int = 5,
    max_len: int | None = None,
    *,
    sos_id: int = SOS_ID,
    eos_id: int = EOS_ID,
    pad_id: int = PAD_ID,
    alpha: float = 0.0,
) -> BeamResult:
    """beam_decode with ancestry indirection: the per-step physical
    reorder of the self-KV cache (~420 MB moved per step at B=64 K=5) is
    replaced by a (B, K, T) int32 parent table that is gathered at
    attention-read time. Writes stay in place; only the small table and
    the beam-indexed score/token state reorder each step.

    Semantically identical to ``beam_decode`` (tests assert equal tokens
    and scores); kept as a separate function for A/B benchmarking."""
    B = memory.shape[0]
    K = beam_size
    T = max_len or cfg.max_seq_len
    V = cfg.vocab_size

    mem_exp = jnp.repeat(memory, K, axis=0)
    cache = decoder_mod.init_cache(params, cfg, mem_exp, max_len=T)

    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), NEG_INF)])[None],
        (B, 1),
    ).astype(jnp.float32)

    state0 = (
        jnp.int32(0),
        jnp.full((B * K,), sos_id, jnp.int32),
        scores0,
        jnp.zeros((B, K), jnp.bool_),
        jnp.full((B, K, T), pad_id, jnp.int32),
        jnp.zeros((B, K, T), jnp.int32),          # ancestry
        cache,
    )

    def cond(state):
        step, _, _, finished, *_ = state
        return jnp.logical_and(step < T, ~jnp.all(finished))

    def body(state):
        step, prev, scores, finished, tokens, anc, cache = state
        # rows attend their own fresh entry at the current position
        own = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (B, K))
        anc_in = jax.lax.dynamic_update_slice(
            anc, own[:, :, None], (0, 0, step))
        logits, cache = _step_indirect(params, cfg, prev, step, cache,
                                       anc_in, B, K)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, K, V)

        pad_only = jnp.full((V,), NEG_INF).at[pad_id].set(0.0)
        cand = jnp.where(finished[:, :, None], pad_only[None, None], logp)
        cand = scores[:, :, None] + cand

        flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)
        beam_idx = top_idx // V
        token = (top_idx % V).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        was_finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        emit = jnp.where(was_finished, pad_id, token)
        tokens = jax.lax.dynamic_update_slice(
            tokens, emit[:, :, None], (0, 0, step))
        finished = was_finished | (token == eos_id)
        scores = top_scores
        # compose ancestry: beam k's history = parent's history, and the
        # just-written column is the parent's own row (anc_in[b,p,step]=p)
        anc = jnp.take_along_axis(anc_in, beam_idx[:, :, None], axis=1)

        prev = jnp.where(finished, eos_id,
                         jnp.where(was_finished, pad_id, token)).reshape(B * K)
        return (step + 1, prev, scores, finished, tokens, anc, cache)

    _, _, scores, finished, tokens, _, _ = jax.lax.while_loop(
        cond, body, state0)

    lengths = jnp.sum(tokens != pad_id, axis=-1)
    if alpha > 0.0:
        norm = jnp.power(jnp.maximum(lengths, 1).astype(jnp.float32), alpha)
        final = scores / norm
    else:
        final = scores
    best = jnp.argmax(final, axis=-1)
    best_tokens = jnp.take_along_axis(
        tokens, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    best_lengths = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    return BeamResult(best_tokens, best_scores, best_lengths)
