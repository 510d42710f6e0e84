"""Stochastic decode: temperature / top-k / top-p (nucleus) sampling.

Beyond the reference (which shipped greedy only — src/inference.py:5-7):
sampling gives diverse candidate readings of ambiguous handwriting, the
standard companion to greedy/beam in production OCR APIs. Structure mirrors
``decode/greedy.py``: the whole decode is ONE device program — a KV-cached
single-token step inside ``lax.while_loop`` with per-row finished masks and
device-side early exit — so sampling costs the same per-step work as greedy
plus an O(V log V) in-loop filter (V here is a few hundred tokens).

Confidence accounting stays on the reference's formula
(app/src/im2latex.py:33-50): per-step log(softmax + 1e-10) of the *chosen*
token from the RAW (untempered, unfiltered) distribution, so reported
confidences are comparable across greedy and sampled decodes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import EOS_ID, ModelConfig, PAD_ID, SOS_ID
from ..models import decoder as decoder_mod
from ..models.layers import Array
from .greedy import GreedyResult

_NEG_INF = -1e30


def filter_logits(logits: Array, temperature: float = 1.0,
                  top_k: int = 0, top_p: float = 1.0) -> Array:
    """Temperature-scale then mask logits outside the top-k set and the
    top-p (nucleus) mass. jit-safe; (B, V) -> (B, V) with masked entries
    at -1e30. ``top_k=0`` / ``top_p>=1`` disable the respective filter.
    The highest-probability token always survives both filters."""
    scaled = logits / jnp.maximum(temperature, 1e-6)
    if top_k and top_k > 0:
        k = min(int(top_k), logits.shape[-1])
        kth = jax.lax.top_k(scaled, k)[0][..., -1:]
        scaled = jnp.where(scaled < kth, _NEG_INF, scaled)
    if top_p < 1.0:
        # keep the smallest prefix of the descending-sorted distribution
        # whose cumulative mass reaches top_p (cum - p < top_p keeps the
        # crossing token, and always the argmax)
        sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
        sp = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(sp, axis=-1)
        keep = (cum - sp) < top_p
        cutoff = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        scaled = jnp.where(scaled < cutoff, _NEG_INF, scaled)
    return scaled


def sample_decode(
    params,
    cfg: ModelConfig,
    memory: Array,
    rng: Array,
    max_len: int | None = None,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    sos_id: int = SOS_ID,
    eos_id: int = EOS_ID,
    pad_id: int = PAD_ID,
    use_pallas: bool = False,
) -> GreedyResult:
    """memory: (B, L_enc, d_model) from the encoder; rng: PRNG key.
    Returns the same structure as ``greedy_decode`` (tokens/lengths/
    logprob_sum/token_count) so every downstream surface — confidence,
    detokenize, serving — works unchanged. jit-safe; temperature/top_k/
    top_p are trace-time constants (one compile per setting)."""
    B = memory.shape[0]
    T = max_len or cfg.max_seq_len
    cache = decoder_mod.init_cache(params, cfg, memory, max_len=T)

    state0 = (
        jnp.int32(0),                                 # step
        jnp.full((B,), sos_id, jnp.int32),            # previous token
        jnp.zeros((B,), jnp.bool_),                   # finished
        jnp.full((B, T), pad_id, jnp.int32),          # tokens
        jnp.zeros((B,), jnp.float32),                 # logprob sum
        jnp.zeros((B,), jnp.int32),                   # emitted token count
        cache,
    )

    def cond(state):
        step, _, finished, *_ = state
        return jnp.logical_and(step < T, ~jnp.all(finished))

    def body(state):
        step, prev, finished, tokens, lp_sum, count, cache = state
        logits, cache = decoder_mod.decoder_step(
            params, cfg, prev, step, cache, use_pallas=use_pallas)
        filtered = filter_logits(logits, temperature, top_k, top_p)
        nxt = jax.random.categorical(
            jax.random.fold_in(rng, step), filtered).astype(jnp.int32)
        # confidence from the raw model distribution (reference numerics)
        probs = jax.nn.softmax(logits, axis=-1)
        logp_all = jnp.log(probs + 1e-10)
        logp = jnp.take_along_axis(logp_all, nxt[:, None], axis=-1)[:, 0]

        is_eos = nxt == eos_id
        lp_sum = lp_sum + jnp.where(finished, 0.0, logp)
        count = count + jnp.where(finished | is_eos, 0, 1)
        emit = jnp.where(finished, pad_id, nxt)
        tokens = jax.lax.dynamic_update_slice(
            tokens, emit[:, None], (0, step))
        finished = finished | is_eos
        prev_next = jnp.where(finished, eos_id, nxt)
        return (step + 1, prev_next, finished, tokens, lp_sum, count, cache)

    _, _, _, tokens, lp_sum, count, _ = jax.lax.while_loop(
        cond, body, state0)
    lengths = jnp.sum(tokens != pad_id, axis=-1)
    return GreedyResult(tokens, lengths, lp_sum, count)
