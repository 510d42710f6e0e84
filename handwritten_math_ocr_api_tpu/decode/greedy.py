"""Batched greedy decode with KV cache, lowered to a single XLA while-loop.

Semantics match the reference's batched greedy (src/inference.py:13-25):
encoder runs once, per-sample ``finished`` masks, loop exits early when all
rows hit <eos>; and the serving-side confidence accounting
(app/src/im2latex.py:33-50): per-step log(softmax + 1e-10) of the chosen
token is accumulated (including the <eos> step), averaged over the count of
emitted non-eos tokens, confidence = exp(mean).

The reference re-ran the full decoder on the growing prefix every step
(O(L^2) decoder work, and in serving even the encoder: im2latex.py:27);
here each step is a KV-cached single-token pass inside ``lax.while_loop``
so the whole decode is one device program: no host round-trips per token.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import EOS_ID, ModelConfig, PAD_ID, SOS_ID
from ..models import decoder as decoder_mod
from ..models.layers import Array


class GreedyResult(NamedTuple):
    tokens: Array      # (B, max_len) generated ids, PAD after finish
    lengths: Array     # (B,) number of emitted tokens incl. eos step
    logprob_sum: Array  # (B,) accumulated log-probs (incl. eos step)
    token_count: Array  # (B,) non-eos emitted tokens (confidence denominator)


def greedy_decode(
    params,
    cfg: ModelConfig,
    memory: Array,
    max_len: int | None = None,
    *,
    sos_id: int = SOS_ID,
    eos_id: int = EOS_ID,
    pad_id: int = PAD_ID,
    use_pallas: bool = False,
    constraint=None,
) -> GreedyResult:
    """memory: (B, L_enc, d_model) from the encoder. jit-safe.

    ``constraint``: optional ``decode.constrain.ConstraintTables`` — masks
    each step's logits so the emitted sequence is structurally valid LaTeX
    by construction (decode/constrain.py). Confidence numerics stay on the
    raw logits."""
    B = memory.shape[0]
    T = max_len or cfg.max_seq_len
    cache = decoder_mod.init_cache(params, cfg, memory, max_len=T)
    if constraint is not None:
        from . import constrain as constrain_mod

        cstate0 = constrain_mod.init_state(B)
    else:
        cstate0 = jnp.zeros((B,), jnp.int32)  # placeholder carry

    tokens0 = jnp.full((B, T), pad_id, jnp.int32)
    state0 = (
        jnp.int32(0),                                 # step
        jnp.full((B,), sos_id, jnp.int32),            # previous token
        jnp.zeros((B,), jnp.bool_),                   # finished
        tokens0,
        jnp.zeros((B,), jnp.float32),                 # logprob sum
        jnp.zeros((B,), jnp.int32),                   # emitted token count
        cache,
        cstate0,
    )

    def cond(state):
        step, _, finished, *_ = state
        return jnp.logical_and(step < T, ~jnp.all(finished))

    def body(state):
        step, prev, finished, tokens, lp_sum, count, cache, cstate = state
        logits, cache = decoder_mod.decoder_step(
            params, cfg, prev, step, cache, use_pallas=use_pallas)
        if constraint is not None:
            sel = logits + constrain_mod.step_mask(constraint, cstate,
                                                   step, T)
        else:
            sel = logits
        nxt = jnp.argmax(sel, axis=-1).astype(jnp.int32)
        # log(softmax + 1e-10), reference confidence numerics
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
        # feed the true argmax (incl. eos) as the next input, matching the
        # reference which appends eos to ys (src/inference.py:18-21)
        prev_next = jnp.where(finished, eos_id, nxt)
        if constraint is not None:
            cstate = constrain_mod.advance(constraint, cstate, prev_next)
        return (step + 1, prev_next, finished, tokens, lp_sum, count, cache,
                cstate)

    step, _, finished, tokens, lp_sum, count, _, _ = jax.lax.while_loop(
        cond, body, state0)

    lengths = jnp.sum(tokens != pad_id, axis=-1)
    return GreedyResult(tokens, lengths, lp_sum, count)
