"""Continuous batching: slot-based KV-cache decode with mid-flight
admission.

BASELINE config 5 capability ("ragged batching + bucketed decode lengths",
64 concurrent requests). The dynamic batcher (serve/batcher.py) coalesces
requests that arrive together, but a request that arrives mid-decode must
wait for the whole batch to finish. Here the decoder state is a fixed pool
of SLOTS, each an independent sequence with its own position in a shared
KV cache; decode runs in short jitted SEGMENTS, and between segments the
host harvests finished slots and admits queued requests into the freed
rows (encoder + cross-K/V projection + scatter fused in one jitted insert
per admission-size bucket). The chip never waits for stragglers and new
work never waits for the batch: occupancy stays high under ragged output
lengths — exactly the regime the reference's serving path (sequential,
whole-prefix recompute: app/src/main.py:546, app/src/im2latex.py:26-27)
could not batch at all.

Device-side semantics per slot row are identical to the greedy engine
(confidence math included); tests assert slot decode == batch greedy
decode for the same images.
"""

from __future__ import annotations

import logging
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EOS_ID, ModelConfig, PAD_ID, SOS_ID
from ..core.tokenizer import Tokenizer, clean_latex_output
from ..models import decoder as decoder_mod
from ..models import model as model_mod
from .api import EMPTY_RESULT_FALLBACK, pick_bucket

logger = logging.getLogger(__name__)


class SlotState(NamedTuple):
    prev: jax.Array      # (S+1,) next input token per slot
    pos: jax.Array       # (S+1,) decode step per slot
    active: jax.Array    # (S+1,) bool — slot holds a live request
    finished: jax.Array  # (S+1,) bool — done, awaiting harvest
    tokens: jax.Array    # (S+1, T)
    lp_sum: jax.Array    # (S+1,)
    count: jax.Array     # (S+1,)
    cache: Dict[str, jax.Array]


def init_slot_state(params, cfg: ModelConfig, num_slots: int,
                    scratch_slots: int = 1) -> SlotState:
    """Slot pool + scratch slot(s) used as the scatter target for padded
    admissions — never active. More than one scratch slot only to round
    the pool to a mesh multiple."""
    S = num_slots + scratch_slots
    T = cfg.max_seq_len
    dtype = jnp.dtype(cfg.dtype)
    nh, dh, L = cfg.nhead, cfg.head_dim, cfg.encoder_len
    cache: Dict[str, jax.Array] = {}
    for i in range(cfg.num_decoder_layers):
        cache[f"cross_k_{i}"] = jnp.zeros((S, nh, L, dh), dtype)
        cache[f"cross_v_{i}"] = jnp.zeros((S, nh, L, dh), dtype)
        cache[f"self_k_{i}"] = jnp.zeros((S, cfg.kv_heads, T, dh), dtype)
        cache[f"self_v_{i}"] = jnp.zeros((S, cfg.kv_heads, T, dh), dtype)
    return SlotState(
        prev=jnp.full((S,), SOS_ID, jnp.int32),
        pos=jnp.zeros((S,), jnp.int32),
        active=jnp.zeros((S,), jnp.bool_),
        finished=jnp.zeros((S,), jnp.bool_),
        tokens=jnp.full((S, T), PAD_ID, jnp.int32),
        lp_sum=jnp.zeros((S,), jnp.float32),
        count=jnp.zeros((S,), jnp.int32),
        cache=cache,
    )


def insert_requests(params, model_state, cfg: ModelConfig, state: SlotState,
                    slots: jax.Array, images: jax.Array,
                    num_slots: Optional[int] = None) -> SlotState:
    """Encode ``images`` (K, H, W, 1) and install them at ``slots`` (K,):
    cross-K/V scatter + per-slot reset. Padding rows target a scratch slot
    (index >= num_slots) and are masked inactive. jit-compiled per K
    bucket."""
    memory, _ = model_mod.encode(params, model_state, cfg, images)
    cross = decoder_mod.project_cross_kv(params["decoder"], cfg, memory)
    S = state.prev.shape[0]
    valid = slots < (num_slots if num_slots is not None else S - 1)

    cache = dict(state.cache)
    for name, val in cross.items():
        cache[name] = state.cache[name].at[slots].set(
            val.astype(state.cache[name].dtype))
    return state._replace(
        prev=state.prev.at[slots].set(SOS_ID),
        pos=state.pos.at[slots].set(0),
        active=state.active.at[slots].set(valid),
        finished=state.finished.at[slots].set(False),
        tokens=state.tokens.at[slots].set(PAD_ID),
        lp_sum=state.lp_sum.at[slots].set(0.0),
        count=state.count.at[slots].set(0),
        cache=cache,
    )


def decode_segment(params, cfg: ModelConfig, state: SlotState,
                   n_steps: int) -> SlotState:
    """Advance every live slot by up to ``n_steps`` greedy tokens (early
    exit when none are live)."""
    dec = params["decoder"]
    S = state.prev.shape[0]
    max_len = cfg.max_seq_len

    def live_of(s):
        return s.active & ~s.finished

    def cond(carry):
        i, s = carry
        return jnp.logical_and(i < n_steps, jnp.any(live_of(s)))

    def body(carry):
        i, s = carry
        live = live_of(s)
        logits, cache = decoder_mod.decoder_step_ragged(
            dec, cfg, s.prev, s.pos, s.cache)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        probs = jax.nn.softmax(logits, axis=-1)
        logp = jnp.take_along_axis(
            jnp.log(probs + 1e-10), nxt[:, None], axis=-1)[:, 0]
        is_eos = nxt == EOS_ID

        lp_sum = s.lp_sum + jnp.where(live, logp, 0.0)
        count = s.count + jnp.where(live & ~is_eos, 1, 0)
        written = jax.vmap(
            lambda row, p, t: jax.lax.dynamic_update_slice(row, t[None], (p,))
        )(s.tokens, s.pos, nxt)
        tokens = jnp.where(live[:, None], written, s.tokens)
        done = live & (is_eos | (s.pos + 1 >= max_len))
        pos = jnp.where(live, s.pos + 1, s.pos)
        prev = jnp.where(live, jnp.where(is_eos, EOS_ID, nxt), s.prev)
        new_s = SlotState(prev=prev, pos=pos, active=s.active,
                          finished=s.finished | done, tokens=tokens,
                          lp_sum=lp_sum, count=count, cache=cache)
        return (i + 1, new_s)

    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return out


def release_slots(state: SlotState, mask: jax.Array) -> SlotState:
    """Free harvested slots (mask (S+1,) bool)."""
    return state._replace(active=state.active & ~mask,
                          finished=state.finished & ~mask)


class ContinuousDecoder:
    """Host-side scheduler around the slot pool. Synchronous core (the
    async serving wrapper drives it in an executor)."""

    def __init__(self, params, model_state, cfg: ModelConfig,
                 tokenizer: Optional[Tokenizer] = None, num_slots: int = 32,
                 segment_steps: int = 16,
                 encode_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16, 32),
                 mesh=None):
        """``mesh``: optional Mesh — the slot pool shards over the 'data'
        axis (params replicated), scaling continuous serving across chips
        (the v5e-4 target). The pool is padded so (num_slots + scratch)
        divides the data-axis size."""
        self.params = params
        self.model_state = model_state
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.num_slots = num_slots
        self.segment_steps = segment_steps
        self.encode_buckets = tuple(
            b for b in encode_buckets if b <= num_slots) or (num_slots,)
        self.mesh = mesh
        extra = 1
        if mesh is not None:
            n = mesh.shape["data"]
            total = -(-(num_slots + 1) // n) * n  # round up to mesh multiple
            extra = total - num_slots
        self.state = init_slot_state(params, cfg, num_slots,
                                     scratch_slots=extra)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import mesh as mesh_lib

            self.params = jax.device_put(params, mesh_lib.replicated(mesh))
            self.model_state = jax.device_put(model_state,
                                              mesh_lib.replicated(mesh))
            self.state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(
                    mesh, P(*(("data",) + (None,) * (x.ndim - 1))))),
                self.state)
        self._free: List[int] = list(range(num_slots))
        self._slot_req: Dict[int, int] = {}
        self._pending: List[Tuple[int, np.ndarray]] = []
        self._next_id = 0
        self._insert_fns: Dict[int, callable] = {}
        # params passed as jit arguments (not closure constants) so weights
        # are shared, not baked into every executable
        self._segment_fn = jax.jit(
            lambda p, s: decode_segment(p, self.cfg, s, self.segment_steps),
            donate_argnums=(1,))
        self._release_fn = jax.jit(release_slots, donate_argnums=(0,))
        # stats
        self.segments_run = 0
        self.tokens_emitted = 0
        self.occupancy_sum = 0.0

    # -- public API ---------------------------------------------------------

    def submit(self, image: np.ndarray) -> int:
        """Queue one normalized (H, W, 1) image; returns a request id."""
        rid = self._next_id
        self._next_id += 1
        self._pending.append((rid, np.asarray(image, np.float32)))
        return rid

    @property
    def idle(self) -> bool:
        return not self._pending and not self._slot_req

    def step_once(self) -> Dict[int, Tuple[str, float]]:
        """Admit -> one decode segment -> harvest. Returns finished
        {request_id: (latex, confidence)}."""
        self._admit()
        if self._slot_req:
            self.state = self._segment_fn(self.params, self.state)
            self.segments_run += 1
            self.occupancy_sum += len(self._slot_req) / self.num_slots
        return self._harvest()

    def run_all(self, images) -> List[Tuple[str, float]]:
        """Convenience: submit all, run to completion, return in order."""
        ids = [self.submit(img) for img in images]
        results: Dict[int, Tuple[str, float]] = {}
        while not self.idle:
            results.update(self.step_once())
        return [results[i] for i in ids]

    @property
    def stats(self) -> dict:
        return {
            "mesh": dict(self.mesh.shape) if self.mesh is not None else None,
            "segments_run": self.segments_run,
            "avg_occupancy": (self.occupancy_sum / self.segments_run
                              if self.segments_run else 0.0),
            "active_slots": len(self._slot_req),
            "pending": len(self._pending),
        }

    # -- internals ----------------------------------------------------------

    def _insert_fn(self, k_bucket: int):
        if k_bucket not in self._insert_fns:
            def fn(params, model_state, state, slots, images):
                return insert_requests(params, model_state, self.cfg,
                                       state, slots, images,
                                       num_slots=self.num_slots)

            self._insert_fns[k_bucket] = jax.jit(fn, donate_argnums=(2,))
        return self._insert_fns[k_bucket]

    def _admit(self) -> None:
        n = min(len(self._pending), len(self._free))
        if n == 0:
            return
        bucket = pick_bucket(n, self.encode_buckets)
        n = min(n, bucket)
        batch = self._pending[:n]
        self._pending = self._pending[n:]
        slots = [self._free.pop() for _ in range(n)]
        scratch = self.num_slots  # pad rows scatter into the scratch slot
        slot_arr = np.full((bucket,), scratch, np.int32)
        slot_arr[:n] = slots
        h, w = self.cfg.img_h, self.cfg.img_w
        images = np.zeros((bucket, h, w, 1), np.float32)
        for j, (_, img) in enumerate(batch):
            images[j] = img
        self.state = self._insert_fn(bucket)(
            self.params, self.model_state, self.state,
            jnp.asarray(slot_arr), jnp.asarray(images))
        for slot, (rid, _) in zip(slots, batch):
            self._slot_req[slot] = rid

    def _harvest(self) -> Dict[int, Tuple[str, float]]:
        if not self._slot_req:
            return {}
        finished = np.asarray(self.state.finished)
        done_slots = [s for s in list(self._slot_req) if finished[s]]
        if not done_slots:
            return {}
        tokens = np.asarray(self.state.tokens)
        lp = np.asarray(self.state.lp_sum)
        counts = np.asarray(self.state.count)
        results: Dict[int, Tuple[str, float]] = {}
        mask = np.zeros(int(self.state.prev.shape[0]), bool)
        for s in done_slots:
            rid = self._slot_req.pop(s)
            self.tokens_emitted += int(counts[s])
            if counts[s] == 0:
                results[rid] = (EMPTY_RESULT_FALLBACK, 0.0)
            else:
                conf = float(np.exp(lp[s] / counts[s]))
                latex = clean_latex_output(self.tokenizer.decode(tokens[s]))
                results[rid] = (latex, conf)
            mask[s] = True
            self._free.append(s)
        self.state = self._release_fn(self.state, jnp.asarray(mask))
        return results
