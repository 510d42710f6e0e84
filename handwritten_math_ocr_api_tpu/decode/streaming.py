"""Segmented greedy decode for token streaming (SSE `/predict/stream`).

Beyond the reference (whose serving decode was a blocking per-request loop —
app/src/im2latex.py:15-57): the decode advances in fixed-size SEGMENTS of
``segment_steps`` KV-cached decoder steps per device program, and the host
harvests each segment's freshly emitted tokens as they land. The KV cache
and all loop state stay on device between segment calls (JAX arrays carried
through Python), so streaming costs one small device->host fetch per
segment instead of one per token — the same carried-segment design as the
continuous batching engine (decode/continuous.py), specialized to one
request.

Token/confidence semantics are identical to ``decode/greedy.py`` (reference
numerics: app/src/im2latex.py:33-50), verified by equivalence test.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import EOS_ID, ModelConfig, PAD_ID, SOS_ID
from ..models import decoder as decoder_mod
from ..models.layers import Array


class StreamCarry(NamedTuple):
    step: Array      # () int32 — absolute decode position
    prev: Array      # (B,) int32 — previous token fed to the next step
    finished: Array  # (B,) bool
    lp_sum: Array    # (B,) float32 — accumulated log-probs (incl. eos step)
    count: Array     # (B,) int32 — non-eos emitted tokens
    cache: object    # decoder KV cache pytree


def stream_start(params, cfg: ModelConfig, memory: Array,
                 max_len: int, segment_steps: int,
                 *, sos_id: int = SOS_ID) -> StreamCarry:
    """Initial carry. Cache capacity is rounded up to a whole number of
    segments so the final partial segment never writes past the end."""
    B = memory.shape[0]
    cap = -(-max_len // segment_steps) * segment_steps
    cache = decoder_mod.init_cache(params, cfg, memory, max_len=cap)
    return StreamCarry(
        step=jnp.int32(0),
        prev=jnp.full((B,), sos_id, jnp.int32),
        finished=jnp.zeros((B,), jnp.bool_),
        lp_sum=jnp.zeros((B,), jnp.float32),
        count=jnp.zeros((B,), jnp.int32),
        cache=cache,
    )


def stream_segment(params, cfg: ModelConfig, carry: StreamCarry,
                   segment_steps: int, *, eos_id: int = EOS_ID,
                   pad_id: int = PAD_ID, use_pallas: bool = False):
    """Advance exactly ``segment_steps`` decoder steps (rows that finish
    mid-segment emit PAD and stop accounting). Returns (carry, tokens) with
    tokens (B, segment_steps). jit-safe; segment_steps is static."""
    B = carry.prev.shape[0]

    def body(i, acc):
        carry, toks = acc
        logits, cache = decoder_mod.decoder_step(
            params, cfg, carry.prev, carry.step, carry.cache,
            use_pallas=use_pallas)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        probs = jax.nn.softmax(logits, axis=-1)
        logp_all = jnp.log(probs + 1e-10)
        logp = jnp.take_along_axis(logp_all, nxt[:, None], axis=-1)[:, 0]

        finished = carry.finished
        is_eos = nxt == eos_id
        lp_sum = carry.lp_sum + jnp.where(finished, 0.0, logp)
        count = carry.count + jnp.where(finished | is_eos, 0, 1)
        emit = jnp.where(finished, pad_id, nxt)
        toks = jax.lax.dynamic_update_slice(toks, emit[:, None], (0, i))
        finished = finished | is_eos
        new = StreamCarry(step=carry.step + 1,
                          prev=jnp.where(finished, eos_id, nxt),
                          finished=finished, lp_sum=lp_sum, count=count,
                          cache=cache)
        return new, toks

    toks0 = jnp.full((B, segment_steps), pad_id, jnp.int32)
    return jax.lax.fori_loop(0, segment_steps, body, (carry, toks0))
