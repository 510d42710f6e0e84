"""Greedy decode over the fused decoder-layer megakernel (ops/fused_step).

Same semantics as decode/greedy.py (tokens, early exit, confidence
accounting), but each while-loop step runs the 8 decoder layers as 8 fused
Pallas programs instead of ~120 XLA fusions. Cache layout is merged-head
(L, B, T, D) with T padded to the bf16 sublane tile.

Enable per-engine: ``FusedDecodeEngine`` below, or A/B against the jnp path
with tests/test_fused.py and bench variants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import EOS_ID, ModelConfig, PAD_ID, SOS_ID
from ..models import layers
from ..ops.fused_step import (
    _round_up, build_stacked, build_stacked_full, fused_decoder_layers_step,
    fused_decoder_layers_step_v2, fused_whole_step,
)
from .greedy import GreedyResult


def project_cross_kv_merged(decoder_params, cfg: ModelConfig, memory,
                            l_enc_pad: int | None = None):
    """Cross K/V for the fused kernels' merged-head layout: memory
    (B, L_enc, D) -> (ck, cv) each (L, B, L_enc_pad, D), padding slots
    zero (the kernel masks them)."""
    D = cfg.d_model
    L_enc = memory.shape[1]
    dtype = jnp.dtype(cfg.dtype)
    mem = memory.astype(dtype)
    cross_k, cross_v = [], []
    for lp in decoder_params["layers"]:
        w = lp["cross_attn"]["w_qkv"].astype(dtype)
        b = lp["cross_attn"]["b_qkv"].astype(dtype)
        cross_k.append(jnp.dot(mem, w[:, D:2 * D],
                               preferred_element_type=dtype) + b[D:2 * D])
        cross_v.append(jnp.dot(mem, w[:, 2 * D:],
                               preferred_element_type=dtype) + b[2 * D:])
    ck = jnp.stack(cross_k)
    cv = jnp.stack(cross_v)
    L_enc_pad = l_enc_pad or _round_up(L_enc, 16)
    if L_enc_pad > L_enc:
        pad = ((0, 0), (0, 0), (0, L_enc_pad - L_enc), (0, 0))
        ck = jnp.pad(ck, pad)
        cv = jnp.pad(cv, pad)
    return ck, cv


def init_fused_cache(decoder_params, cfg: ModelConfig, memory,
                     max_len: int | None = None):
    """memory: (B, L_enc, D). Returns (self_k, self_v, cross_k, cross_v)
    in merged-head (L, B, T, D) / (L, B, L_enc, D) layout."""
    L = cfg.num_decoder_layers
    B, L_enc, D = memory.shape
    T = _round_up(max_len or cfg.max_seq_len, 16)
    dtype = jnp.dtype(cfg.dtype)
    ck, cv = project_cross_kv_merged(decoder_params, cfg, memory)
    # self-cache lane width follows the self-attention weights: D for MHA,
    # kv_dim < D under MQA/GQA (the v2 kernel replicates lanes on read)
    w_self = decoder_params["layers"][0]["self_attn"]
    total = (w_self["w_qkv_q"] if "w_qkv_q" in w_self
             else w_self["w_qkv"]).shape[-1]
    kvd = (total - D) // 2
    return (jnp.zeros((L, B, T, kvd), dtype),
            jnp.zeros((L, B, T, kvd), dtype), ck, cv)


def greedy_decode_fused(decoder_params, stacked, cfg: ModelConfig, memory,
                        max_len: int | None = None, *,
                        sos_id: int = SOS_ID, eos_id: int = EOS_ID,
                        pad_id: int = PAD_ID,
                        interpret: bool | None = None,
                        variant: str = "v2",
                        t_buckets: tuple = (40, 80, 120),
                        rng=None, temperature: float = 1.0,
                        top_k: int = 0, top_p: float = 1.0,
                        constraint=None) -> GreedyResult:
    """Drop-in equivalent of decode.greedy.greedy_decode using the fused
    layer kernel. ``stacked`` from ops.fused_step.build_stacked.

    variant "v2" (default): compute-only kernel, cache rows appended by two
    dynamic_update_slice on the stacked caches — no (B, T, D) write-back.
    variant "v2m": v2 with attention as batched MXU matmuls and the fresh
    row as an online-softmax term. A/B-measured SLOWER than v2 at batch 10
    (83 vs 68 us/step): B-batched matmuls with M=H=8 are poor MXU shapes
    (160 tiny matmuls per step). Kept for A/B evidence.
    variant "v4": whole-step kernel — embedding gather, all layers, output
    head (argmax + log-prob) and in-place cache-row append in ONE Pallas
    program; only the (B,)-vector eos bookkeeping stays in XLA. ``stacked``
    must come from build_stacked_full (auto-built here if the head tables
    are missing). Uses time-major (L, T, B, D) caches.
    variant "v3": the same whole-step kernel over v2's batch-major caches
    (fresh rows appended by dynamic_update_slice outside).
    variant "v1": the round-1 aliased-write-back kernel (kept for A/B).
    variant "v5": the whole-DECODE kernel (ops/whole_decode.py) — the
    entire loop in one Pallas launch with weights resident in VMEM;
    ``stacked`` should come from ops.whole_decode.build_resident (int8)
    for the flagship size; a build_stacked_full bundle works for small
    configs and is auto-completed here. Measured at parity with v2 at
    batch 10 and slower at batch 1 — experimental, see the module
    docstring for the A/B record.

    ``rng``: when given, the decode SAMPLES instead of argmax — the
    temperature/top_k/top_p filter (decode/sampling.py) runs in XLA on the
    logits the kernel emits, so sampling rides the same fused megakernel
    step. Only variants that surface logits outside the kernel (v1/v2/v2m)
    support it; v3/v4/v5 compute argmax in-kernel."""
    if rng is not None and variant not in ("v1", "v2", "v2m"):
        raise NotImplementedError(
            f"sampled fused decode needs XLA-side logits; variant "
            f"{variant!r} computes argmax in-kernel — use 'v2'")
    if constraint is not None and variant not in ("v1", "v2", "v2m"):
        raise NotImplementedError(
            f"constrained fused decode needs XLA-side logits; variant "
            f"{variant!r} computes argmax in-kernel — use 'v2'")
    if cfg.kv_heads != cfg.nhead and (variant != "v2"
                                      or cfg.kv_heads != 1):
        raise NotImplementedError(
            f"fused variant {variant!r} supports MHA, and MQA (nhead_kv=1) "
            "via variant='v2': the kernel's lane replication of the shared "
            "K/V head is only head-order-correct at one kv head. GQA "
            "(1 < nhead_kv < nhead) decodes on the XLA path — measured "
            "unprofitable on v5e anyway (BENCHMARKS.md)")
    if variant == "v5":
        from ..ops.whole_decode import build_resident, fused_whole_decode

        if "emb" not in stacked or "_params" not in stacked:
            # auto-build follows the caller's bundle: int8 only when the
            # passed stacked dict was quantize_stacked'ed (has `*_s`
            # scales), so a bf16 build_stacked bundle never silently
            # becomes int8 numerics
            was_quantized = any(k.endswith("_s") for k in stacked)
            stacked = build_resident(decoder_params, cfg,
                                     quantize=was_quantized)
        res = fused_whole_decode(
            stacked, cfg, memory, max_len, sos_id=sos_id, eos_id=eos_id,
            pad_id=pad_id, interpret=interpret)
        return GreedyResult(res.tokens, res.lengths, res.logprob_sum,
                            res.token_count)
    B = memory.shape[0]
    l_enc_actual = memory.shape[1]
    if variant in ("v3", "v4") and "emb" not in stacked:
        stacked = build_stacked_full(decoder_params, cfg)
    T_out = max_len or cfg.max_seq_len
    dtype = jnp.dtype(cfg.dtype)
    self_k, self_v, cross_k, cross_v = init_fused_cache(
        decoder_params, cfg, memory, max_len)
    if variant == "v4":  # whole-step kernel wants time-major self caches
        L = cfg.num_decoder_layers
        T_pad = _round_up(T_out, 16)
        self_k = jnp.zeros((L, T_pad, B, cfg.d_model), dtype)
        self_v = jnp.zeros_like(self_k)

    emb = decoder_params["embedding"]["table"]
    pos_table = decoder_params["pos"]["table"]
    fc_out = decoder_params["fc_out"]

    if constraint is not None:
        from . import constrain as constrain_mod

        cstate0 = constrain_mod.init_state(B)
    else:
        cstate0 = jnp.zeros((B,), jnp.int32)  # placeholder carry

    tokens0 = jnp.full((B, T_out), pad_id, jnp.int32)
    state0 = (
        jnp.int32(0),
        jnp.full((B,), sos_id, jnp.int32),
        jnp.zeros((B,), jnp.bool_),
        tokens0,
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        self_k, self_v, cstate0,
    )

    def cond(state):
        step, _, finished, *_ = state
        return jnp.logical_and(step < T_out, ~jnp.all(finished))

    def body(state, t_active=None):
        step, prev, finished, tokens, lp_sum, count, sk, sv, cstate = state
        if variant in ("v3", "v4"):
            if variant == "v4":
                nxt, logp, sk, sv = fused_whole_step(
                    stacked, cfg, prev, sk, sv, cross_k, cross_v, step,
                    l_enc_actual=l_enc_actual, interpret=interpret)
            else:  # v3: batch-major caches, rows appended here
                nxt, logp, k_new, v_new = fused_whole_step(
                    stacked, cfg, prev, sk, sv, cross_k, cross_v, step,
                    l_enc_actual=l_enc_actual, interpret=interpret,
                    time_major=False)
                sk = jax.lax.dynamic_update_slice(
                    sk, k_new[:, :, None, :], (0, 0, step, 0))
                sv = jax.lax.dynamic_update_slice(
                    sv, v_new[:, :, None, :], (0, 0, step, 0))
            is_eos = nxt == eos_id
            lp_sum = lp_sum + jnp.where(finished, 0.0, logp)
            count = count + jnp.where(finished | is_eos, 0, 1)
            emit = jnp.where(finished, pad_id, nxt)
            tokens = jax.lax.dynamic_update_slice(tokens, emit[:, None],
                                                  (0, step))
            finished = finished | is_eos
            prev_next = jnp.where(finished, eos_id, nxt)
            return (step + 1, prev_next, finished, tokens, lp_sum, count,
                    sk, sv, cstate)
        x_emb = (emb[prev] + pos_table[step]).astype(dtype)   # (B, D)
        if variant in ("v2", "v2m"):
            x, k_new, v_new = fused_decoder_layers_step_v2(
                stacked, cfg, x_emb, sk, sv, cross_k, cross_v, step,
                l_enc_actual=l_enc_actual, interpret=interpret,
                mxu_attn=variant == "v2m", t_active=t_active)
            sk = jax.lax.dynamic_update_slice(
                sk, k_new[:, :, None, :], (0, 0, step, 0))
            sv = jax.lax.dynamic_update_slice(
                sv, v_new[:, :, None, :], (0, 0, step, 0))
        else:
            x, sk, sv = fused_decoder_layers_step(
                stacked, cfg, x_emb, sk, sv, cross_k, cross_v, step,
                l_enc_actual=l_enc_actual, interpret=interpret)
        logits = layers.linear(fc_out, x.astype(jnp.float32))  # (B, V)

        sel = logits
        if constraint is not None:
            sel = sel + constrain_mod.step_mask(constraint, cstate, step,
                                                T_out)
        if rng is not None:
            from .sampling import filter_logits

            filtered = filter_logits(sel, temperature, top_k, top_p)
            nxt = jax.random.categorical(
                jax.random.fold_in(rng, step), filtered).astype(jnp.int32)
        else:
            nxt = jnp.argmax(sel, axis=-1).astype(jnp.int32)
        probs = jax.nn.softmax(logits, axis=-1)
        logp = jnp.take_along_axis(jnp.log(probs + 1e-10), nxt[:, None],
                                   axis=-1)[:, 0]
        is_eos = nxt == eos_id
        lp_sum = lp_sum + jnp.where(finished, 0.0, logp)
        count = count + jnp.where(finished | is_eos, 0, 1)
        emit = jnp.where(finished, pad_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, emit[:, None],
                                              (0, step))
        finished = finished | is_eos
        prev_next = jnp.where(finished, eos_id, nxt)
        if constraint is not None:
            cstate = constrain_mod.advance(constraint, cstate, prev_next)
        return (step + 1, prev_next, finished, tokens, lp_sum, count,
                sk, sv, cstate)

    if variant == "v2":
        # T-prefix bucketing: at decode step t only cache rows [0, t)
        # exist, but a single compiled step streams and computes the
        # full T extent every step. Chain one while_loop per static
        # T bucket — the kernel in bucket b only fetches (BlockSpec
        # prefix) and attends over [0, b). Average extent for a
        # worst-case 150-step decode drops 150 -> ~93; a typical
        # ~25-token decode stays entirely in the first bucket.
        buckets = sorted({min(b, T_out) for b in (t_buckets or ())}
                         | {T_out})
        state = state0
        for tb in buckets:
            def cond_b(state, _tb=jnp.int32(min(tb, T_out))):
                step, _, finished, *_ = state
                return jnp.logical_and(step < _tb,
                                       ~jnp.all(finished))

            state = jax.lax.while_loop(
                cond_b,
                lambda s, _tb=(None if tb >= T_out else tb): body(s, _tb),
                state)
        _, _, _, tokens, lp_sum, count = state[:6]
    else:
        final = jax.lax.while_loop(cond, body, state0)
        _, _, _, tokens, lp_sum, count = final[:6]
    lengths = jnp.sum(tokens != pad_id, axis=-1)
    return GreedyResult(tokens, lengths, lp_sum, count)


def beam_decode_fused(decoder_params, stacked, cfg: ModelConfig, memory,
                      beam_size: int = 5, max_len: int | None = None, *,
                      sos_id: int = SOS_ID, eos_id: int = EOS_ID,
                      pad_id: int = PAD_ID, alpha: float = 0.0,
                      interpret: bool | None = None):
    """Beam search over the fused ragged megakernel (the production decode
    fast path), semantically identical to decode.beam.beam_decode.

    The round-2/3 beam close-out (BENCHMARKS.md "Beam cost anatomy") left
    ~8 ms/step of the 13.4 ms XLA while-body unattributed after refuting
    three gather hypotheses — and the fused greedy kernel demonstrates the
    same per-row work in ~7 us/row/step. This routes the B*K beam rows
    through ops.fused_step.fused_ragged_step (chunked grid: (B*K, T, D)
    cache blocks do not fit the ~16 MB VMEM in one block) with
    ``return_logits=True``; candidate ranking, the beam bookkeeping, and
    the per-step physical cache reorder (the measured-best variant; the
    ancestry-indirection A/B stands) stay in XLA. Supports MHA and MQA
    (nhead_kv=1), int8 bundles from quantize_stacked in-kernel; GQA
    raises (DecodeEngine degrades GQA to the XLA path at init).

    The reference configured beam_size=5 but never implemented beam
    search (src/config.py:50, src/inference.py:5); this is the fused
    variant of the capability the XLA beam_decode supplies.
    """
    from ..ops.fused_step import build_stacked_full, fused_ragged_step
    from .beam import NEG_INF, BeamResult

    if cfg.kv_heads not in (cfg.nhead, 1):
        raise NotImplementedError(
            "fused beam decode supports MHA and MQA (nhead_kv=1); GQA "
            "decodes on the XLA beam path")
    if "emb" not in stacked:  # need the head/embedding tables in-kernel
        from ..ops.fused_step import quantize_stacked

        was_quantized = any(k.endswith("_s") for k in stacked)
        stacked = build_stacked_full(decoder_params, cfg)
        if was_quantized:
            stacked = quantize_stacked(stacked)

    B = memory.shape[0]
    K = beam_size
    BK = B * K
    T = max_len or cfg.max_seq_len
    V = cfg.vocab_size
    L = cfg.num_decoder_layers
    l_enc_actual = memory.shape[1]

    # row blocking: the ragged kernel chunks rows so cache blocks fit
    # VMEM; rows are padded to the block multiple with dead rows (their
    # fresh K/V land in dead cache rows; the beam state never reads
    # them). Blocks must sit on the 8-sublane hardware tile — a bb=BK
    # block for small BK (e.g. single-image beam-5 -> 5 rows) fails
    # Mosaic's alignment proof on hardware even though interpret mode
    # accepts it (caught on-chip; see tests/test_fused.py)
    if BK % 16 == 0:
        bb, R = 16, BK
    else:
        R = -(-BK // 8) * 8
        bb = 16 if R % 16 == 0 else 8

    mem_exp = jnp.repeat(memory, K, axis=0)            # (B*K, L_enc, D)
    if R > BK:
        mem_exp = jnp.pad(mem_exp, ((0, R - BK), (0, 0), (0, 0)))
    self_k, self_v, cross_k, cross_v = init_fused_cache(
        decoder_params, cfg, mem_exp, max_len=T)

    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)),
                         jnp.full((K - 1,), NEG_INF)])[None],
        (B, 1),
    ).astype(jnp.float32)

    state0 = (
        jnp.int32(0),
        jnp.full((R,), sos_id, jnp.int32),             # prev per row
        scores0,                                        # (B, K)
        jnp.zeros((B, K), jnp.bool_),                   # finished
        jnp.full((B, K, T), pad_id, jnp.int32),         # tokens
        self_k, self_v,
    )

    def reorder(x, beam_idx):
        """x: (L, R, ...) — gather the first B*K rows by beam_idx (B, K);
        padded dead rows stay in place. XLA-gather formulation, kept as
        the A/B arm and the tokens-array path (tiny) — the K/V caches go
        through the Pallas block-DMA gather below (ops/beam_reorder.py):
        this take_along_axis lowering measured ~11% of HBM peak and was
        ~78% of the whole beam step at the full T extent
        (benchmarks/probe_beam_split_results.json)."""
        trail = x.shape[2:]
        real = x[:, :BK].reshape(L, B, K, *trail)
        idx = beam_idx.reshape(1, B, K, *([1] * len(trail)))
        real = jnp.take_along_axis(real, idx, axis=2).reshape(
            L, BK, *trail)
        if R > BK:
            real = jnp.concatenate([real, x[:, BK:]], axis=1)
        return real

    dead_src = jnp.arange(BK, R, dtype=jnp.int32)

    def reorder_caches(sk, sv, beam_idx, t_ext):
        """Parent-gather both caches over [0, t_ext) via the Pallas
        block-DMA kernel; rows >= BK (tile padding) map to themselves.
        MATHOCR_BEAM_REORDER=gather selects the XLA take_along_axis arm
        (A/B escape; 3.0x slower at the full T extent)."""
        import os

        if os.environ.get("MATHOCR_BEAM_REORDER") == "gather":
            return (reorder(sk[:, :, :t_ext], beam_idx),
                    reorder(sv[:, :, :t_ext], beam_idx))
        from ..ops.beam_reorder import beam_cache_gather

        src = (jnp.arange(B, dtype=jnp.int32)[:, None] * K
               + beam_idx).reshape(BK)
        if R > BK:
            src = jnp.concatenate([src, dead_src])
        return beam_cache_gather(sk, sv, src, t_ext, interpret=interpret)

    def cond(state):
        step, _, _, finished, *_ = state
        return jnp.logical_and(step < T, ~jnp.all(finished))

    def body(state, t_active=None):
        step, prev, scores, finished, tokens, sk, sv = state
        pos_vec = jnp.full((R,), step, jnp.int32)
        logits_full, k_new, v_new = fused_ragged_step(
            stacked, cfg, prev, pos_vec, sk, sv, cross_k, cross_v,
            l_enc_actual=l_enc_actual, block_b=bb, return_logits=True,
            t_active=t_active, interpret=interpret)
        # append fresh rows (uniform position), then reorder by parent
        sk = jax.lax.dynamic_update_slice(
            sk, k_new[:, :, None, :], (0, 0, step, 0))
        sv = jax.lax.dynamic_update_slice(
            sv, v_new[:, :, None, :], (0, 0, step, 0))

        logits = logits_full[:BK, :V]
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)

        # identical candidate/bookkeeping semantics to beam_decode
        pad_only = jnp.full((V,), NEG_INF).at[pad_id].set(0.0)
        cand = jnp.where(finished[:, :, None], pad_only[None, None], logp)
        cand = scores[:, :, None] + cand               # (B, K, V)

        flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)   # (B, K)
        beam_idx = top_idx // V
        token = (top_idx % V).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        was_finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        emit = jnp.where(was_finished, pad_id, token)
        tokens = jax.lax.dynamic_update_slice(
            tokens, emit[:, :, None], (0, 0, step))
        finished = was_finished | (token == eos_id)
        scores = top_scores

        if t_active is not None and t_active < T:
            # reorder only the live [0, t_active) prefix: rows beyond
            # the current position are still all-zero (never written),
            # so the parent gather is the identity there
            gk, gv = reorder_caches(sk, sv, beam_idx, t_active)
            sk = jax.lax.dynamic_update_slice(sk, gk, (0, 0, 0, 0))
            sv = jax.lax.dynamic_update_slice(sv, gv, (0, 0, 0, 0))
        else:
            # full extent: gather the whole (tile-padded) T dim so the
            # carry shape is preserved
            sk, sv = reorder_caches(sk, sv, beam_idx, sk.shape[2])

        prev_real = jnp.where(
            finished, eos_id,
            jnp.where(was_finished, pad_id, token)).reshape(BK)
        prev = (jnp.concatenate(
            [prev_real, jnp.full((R - BK,), pad_id, jnp.int32)])
            if R > BK else prev_real)
        return (step + 1, prev, scores, finished, tokens, sk, sv)

    # T-prefix bucketed loops (same design as greedy_decode_fused): at
    # step t the kernel streams/attends and the parent reorder gathers
    # only cache rows [0, bucket) — the dominant per-step costs all
    # scale with the T extent at B*K rows
    state = state0
    for tb in sorted({min(b, T) for b in (40, 80, 120)} | {T}):
        def cond_b(state, _tb=jnp.int32(tb)):
            step, _, _, finished, *_ = state
            return jnp.logical_and(step < _tb, ~jnp.all(finished))

        state = jax.lax.while_loop(
            cond_b,
            lambda s, _tb=(None if tb >= T else tb): body(s, _tb),
            state)
    _, _, scores, finished, tokens, _, _ = state

    lengths = jnp.sum(tokens != pad_id, axis=-1)       # (B, K)
    if alpha > 0.0:
        norm = jnp.power(jnp.maximum(lengths, 1).astype(jnp.float32),
                         alpha)
        final = scores / norm
    else:
        final = scores
    best = jnp.argmax(final, axis=-1)                  # (B,)
    best_tokens = jnp.take_along_axis(
        tokens, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    best_lengths = jnp.take_along_axis(lengths, best[:, None],
                                       axis=1)[:, 0]
    return BeamResult(best_tokens, best_scores, best_lengths)
