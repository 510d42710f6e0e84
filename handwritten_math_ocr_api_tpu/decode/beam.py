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
