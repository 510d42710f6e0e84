"""Attribution probe: where does the fused beam step's time go?

Round-3 left beam-5 eval at 74.79 img/s vs greedy 1009 img/s — ~2.7x off
compute-parity (5x work). Per-step suspects at B*K = 320 rows:

  a. the ragged megakernel itself (return_logits surfaces (R, Vp) to XLA)
  b. the per-step PHYSICAL cache reorder: take_along_axis over the whole
     (L, B*K, t, kvd) self cache — pure HBM traffic that scales with the
     T-prefix bucket
  c. log_softmax + top-k + beam bookkeeping
  d. the full beam body (a+b+c composed, via one while_loop segment)

All timings are elision-proof: chained jit with a scalar accumulator,
one terminal fetch, median of --iters.

Usage: python benchmarks/probe_beam_split.py [--batch 64] [--beam 5]
       [--t-active 0] [--vocab 600]
Writes benchmarks/probe_beam_split_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=600)
    ap.add_argument("--t-active", type=int, default=0,
                    help="T-prefix bucket to compile at (0 = full T)")
    ap.add_argument("--block-b", type=int, default=16)
    ap.add_argument("--out", default="probe_beam_split_results.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.models.decoder import (
        init_decoder_params,
    )
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        build_stacked_full, fused_ragged_step,
    )

    cfg = ModelConfig(vocab_size=args.vocab)
    key = jax.random.PRNGKey(0)
    params = init_decoder_params(key, cfg)
    stacked = build_stacked_full(params, cfg)
    B, K = args.batch, args.beam
    BK = B * K
    R = BK if BK % 8 == 0 else -(-BK // 8) * 8
    T = cfg.max_seq_len
    L, D, kvd = cfg.num_decoder_layers, cfg.d_model, cfg.kv_dim
    L_enc = cfg.encoder_len
    V = args.vocab
    t_active = args.t_active or None
    t_eff = t_active or T

    ks = jax.random.split(key, 8)
    sk = (jax.random.normal(ks[0], (L, R, T, kvd)) * 0.3).astype(jnp.bfloat16)
    sv = (jax.random.normal(ks[1], (L, R, T, kvd)) * 0.3).astype(jnp.bfloat16)
    ck = (jax.random.normal(ks[2], (L, R, L_enc, D)) * 0.3).astype(
        jnp.bfloat16)
    cv = (jax.random.normal(ks[3], (L, R, L_enc, D)) * 0.3).astype(
        jnp.bfloat16)
    prev = jax.random.randint(ks[4], (R,), 4, V).astype(jnp.int32)
    pos0 = jnp.full((R,), min(8, t_eff - args.steps - 1), jnp.int32)
    beam_idx = jax.random.randint(ks[5], (B, K), 0, K).astype(jnp.int32)
    scores = jax.random.normal(ks[6], (B, K)).astype(jnp.float32)

    def timed(fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(out)
        for _ in range(3):
            out = fn(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters / args.steps

    S = args.steps

    # a) kernel alone with return_logits, chained
    @jax.jit
    def kernel_chain(prev, pos, sk, sv):
        def body(i, c):
            pv, ps, acc = c
            logits, k_rows, v_rows = fused_ragged_step(
                stacked, cfg, pv, ps, sk, sv, ck, cv, L_enc,
                block_b=args.block_b, return_logits=True,
                t_active=t_active)
            acc = acc + logits.sum() + k_rows.sum().astype(jnp.float32)
            nv = jnp.argmax(logits[:, :V], axis=-1).astype(jnp.int32)
            return (nv, ps + 1, acc)
        _, _, acc = jax.lax.fori_loop(0, S, body,
                                      (prev, pos, jnp.float32(0)))
        return acc

    dt_kernel = timed(kernel_chain, prev, pos0, sk, sv)

    # b) physical reorder alone (the beam parent gather), chained
    def reorder(x, bidx):
        trail = x.shape[2:]
        real = x[:, :BK].reshape(L, B, K, *trail)
        idx = bidx.reshape(1, B, K, *([1] * len(trail)))
        real = jnp.take_along_axis(real, idx, axis=2).reshape(
            L, BK, *trail)
        if R > BK:
            real = jnp.concatenate([real, x[:, BK:]], axis=1)
        return real

    @jax.jit
    def reorder_chain(sk, sv, bidx):
        def body(i, c):
            sk, sv, bidx = c
            if t_active is not None and t_active < T:
                sk = jax.lax.dynamic_update_slice(
                    sk, reorder(sk[:, :, :t_active], bidx), (0, 0, 0, 0))
                sv = jax.lax.dynamic_update_slice(
                    sv, reorder(sv[:, :, :t_active], bidx), (0, 0, 0, 0))
            else:
                sk = reorder(sk, bidx)
                sv = reorder(sv, bidx)
            bidx = (bidx + 1) % K
            return (sk, sv, bidx)
        sk, sv, _ = jax.lax.fori_loop(0, S, body, (sk, sv, bidx))
        return sk[0, 0, 0, 0].astype(jnp.float32) + sv[0, 0, 0, 0].astype(
            jnp.float32)

    dt_reorder = timed(reorder_chain, sk, sv, beam_idx)

    # b2) one-hot-matmul reorder: the same parent gather expressed as a
    # (B,K,K) selection matrix contracted on the MXU — take_along_axis's
    # gather lowering measured ~11% of HBM peak; matmul streams at
    # memory speed. Selection weights are exactly 0/1 so values are
    # bit-preserved (single-term f32 accumulate, cast back).
    def reorder_mm(x, bidx, t_ext):
        real = x[:, :BK, :t_ext].reshape(L, B, K, -1)
        oh = jax.nn.one_hot(bidx, K, dtype=x.dtype)       # (B, K, K)
        out = jnp.einsum("bkj,lbjf->lbkf", oh, real,
                         preferred_element_type=jnp.float32)
        return out.astype(x.dtype).reshape(L, BK, t_ext, kvd)

    @jax.jit
    def reorder_mm_chain(sk, sv, bidx):
        def body(i, c):
            sk, sv, bidx = c
            if t_active is not None and t_active < T:
                rk = reorder_mm(sk, bidx, t_active)
                rv = reorder_mm(sv, bidx, t_active)
                if R > BK:
                    rk = jnp.concatenate([rk, sk[:, BK:, :t_active]],
                                         axis=1)
                    rv = jnp.concatenate([rv, sv[:, BK:, :t_active]],
                                         axis=1)
                sk = jax.lax.dynamic_update_slice(sk, rk, (0, 0, 0, 0))
                sv = jax.lax.dynamic_update_slice(sv, rv, (0, 0, 0, 0))
            else:  # full extent: produce directly, like the gather arm
                rk = reorder_mm(sk, bidx, T)
                rv = reorder_mm(sv, bidx, T)
                if R > BK:
                    rk = jnp.concatenate([rk, sk[:, BK:]], axis=1)
                    rv = jnp.concatenate([rv, sv[:, BK:]], axis=1)
                sk, sv = rk, rv
            bidx = (bidx + 1) % K
            return (sk, sv, bidx)
        sk, sv, _ = jax.lax.fori_loop(0, S, body, (sk, sv, bidx))
        return sk[0, 0, 0, 0].astype(jnp.float32) + sv[0, 0, 0, 0].astype(
            jnp.float32)

    dt_reorder_mm = timed(reorder_mm_chain, sk, sv, beam_idx)

    # b3) Pallas block-DMA gather (ops/beam_reorder.py) — the adopted arm
    from handwritten_math_ocr_api_tpu.ops.beam_reorder import (
        beam_cache_gather,
    )

    src0 = (jnp.arange(B, dtype=jnp.int32)[:, None] * K
            + beam_idx).reshape(BK)
    if R > BK:
        src0 = jnp.concatenate([src0,
                                jnp.arange(BK, R, dtype=jnp.int32)])

    @jax.jit
    def reorder_pl_chain(sk, sv, src):
        def body(i, c):
            sk, sv, src = c
            if t_active is not None and t_active < T:
                gk, gv = beam_cache_gather(sk, sv, src, t_active)
                sk = jax.lax.dynamic_update_slice(sk, gk, (0, 0, 0, 0))
                sv = jax.lax.dynamic_update_slice(sv, gv, (0, 0, 0, 0))
            else:
                sk, sv = beam_cache_gather(sk, sv, src, T)
            src = (src + 1) % R
            return (sk, sv, src)
        sk, sv, _ = jax.lax.fori_loop(0, S, body, (sk, sv, src0))
        return sk[0, 0, 0, 0].astype(jnp.float32) + sv[0, 0, 0, 0].astype(
            jnp.float32)

    dt_reorder_pl = timed(reorder_pl_chain, sk, sv, src0)

    # c) ranking/bookkeeping alone, chained
    logits0 = jax.random.normal(ks[7], (R, V)).astype(jnp.float32)
    tokens0 = jnp.zeros((B, K, T), jnp.int32)

    @jax.jit
    def rank_chain(logits, scores, tokens):
        def body(i, c):
            scores, tokens, acc = c
            logp = jax.nn.log_softmax(logits[:BK], axis=-1).reshape(B, K, V)
            cand = scores[:, :, None] + logp
            flat = cand.reshape(B, K * V)
            top_scores, top_idx = jax.lax.top_k(flat, K)
            bidx = top_idx // V
            token = (top_idx % V).astype(jnp.int32)
            tokens = jnp.take_along_axis(tokens, bidx[:, :, None], axis=1)
            tokens = jax.lax.dynamic_update_slice(
                tokens, token[:, :, None], (0, 0, i))
            return (top_scores, tokens,
                    acc + top_scores.sum() + bidx.sum().astype(jnp.float32))
        _, _, acc = jax.lax.fori_loop(
            0, S, body, (scores, tokens, jnp.float32(0)))
        return acc

    dt_rank = timed(rank_chain, logits0, scores, tokens0)

    out = {
        "batch": B, "beam": K, "rows": R, "t_active": t_eff,
        "vocab": V, "steps_chained": S,
        "ms_kernel": round(dt_kernel * 1e3, 3),
        "ms_reorder": round(dt_reorder * 1e3, 3),
        "ms_reorder_mm": round(dt_reorder_mm * 1e3, 3),
        "ms_reorder_pallas": round(dt_reorder_pl * 1e3, 3),
        "ms_rank": round(dt_rank * 1e3, 3),
        "ms_sum_abc": round((dt_kernel + dt_reorder + dt_rank) * 1e3, 3),
        "reorder_bytes_mb": round(
            2 * 2 * L * BK * t_eff * kvd * 2 / 1e6, 1),
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        args.out)
    existing = []
    if os.path.exists(path):
        try:
            existing = json.load(open(path))
        except Exception:
            existing = []
    existing.append(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=2)


if __name__ == "__main__":
    main()
