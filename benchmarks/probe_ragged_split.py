"""Attribution probe: where does the ragged segment step's time go?

The engine-level config-5 ceiling (143.8 img/s at 64 slots, occupancy
0.99) implies ~3 ms per 64-row ragged step, while the same kernel's HBM
floor (full cache + weight reads) is ~0.15 ms and the batch-path v2
kernel runs 2.2x off its floor. This times, on-chip and elision-proof
(chained jit, one terminal fetch):

  a. fused_ragged_step alone (64 rows, chained over steps)
  b. the two fresh-row cache appends alone (double-vmapped
     dynamic_update_slice at per-row positions, as decode_segment_fused
     does them)
  c. the full decode_segment_fused body (kernel + appends + bookkeeping
     in a while_loop segment)

Usage: python benchmarks/probe_ragged_split.py [--slots 64] [--steps 16]
Writes benchmarks/probe_ragged_split_results.json.
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
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=600)
    ap.add_argument("--block-b", type=int, default=16,
                    help="kernel rows per grid chunk (A/B 16/32/64: fewer, "
                         "larger grid programs vs per-program VMEM)")
    ap.add_argument("--t-active", type=int, default=0,
                    help="compile the step at this T-prefix bucket "
                         "(0 = full T)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.decode.continuous import (
        SmallState, decode_segment_fused,
    )
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
    B, T = args.slots, cfg.max_seq_len
    L, D, kvd = cfg.num_decoder_layers, cfg.d_model, cfg.kv_dim
    L_enc = cfg.encoder_len

    ks = jax.random.split(key, 8)
    sk = (jax.random.normal(ks[0], (L, B, T, kvd)) * 0.3).astype(jnp.bfloat16)
    sv = (jax.random.normal(ks[1], (L, B, T, kvd)) * 0.3).astype(jnp.bfloat16)
    ck = (jax.random.normal(ks[2], (L, B, L_enc, D)) * 0.3).astype(
        jnp.bfloat16)
    cv = (jax.random.normal(ks[3], (L, B, L_enc, D)) * 0.3).astype(
        jnp.bfloat16)
    prev = jax.random.randint(ks[4], (B,), 4, args.vocab).astype(jnp.int32)
    pos = jax.random.randint(ks[5], (B,), 0, 64).astype(jnp.int32)

    def timed(fn, *xs, land):
        out = fn(*xs)
        jax.block_until_ready(land(out))
        for _ in range(3):
            out = fn(*xs)
        jax.block_until_ready(land(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*xs)
        jax.block_until_ready(land(out))
        return (time.perf_counter() - t0) / args.iters

    S = args.steps
    t_active = args.t_active or None

    # a) kernel alone, chained S steps (pos advances so shapes stay hot)
    @jax.jit
    def kernel_chain(prev, pos, sk, sv):
        def body(i, c):
            pv, ps, acc = c
            nxt, logp, k_rows, v_rows = fused_ragged_step(
                stacked, cfg, pv, ps, sk, sv, ck, cv, L_enc,
                block_b=args.block_b, t_active=t_active)
            acc = acc + logp.sum() + k_rows.sum().astype(jnp.float32)
            return (nxt, ps + 1, acc)
        _, _, acc = jax.lax.fori_loop(
            0, S, body, (prev, pos, jnp.float32(0)))
        return acc

    dt_kernel = timed(kernel_chain, prev, pos, sk, sv, land=lambda o: o)

    # b) appends alone, chained S steps (same double-vmapped DUS)
    def row_append(c, r, p):
        return jax.lax.dynamic_update_slice(c, r[None], (p, 0))

    append = jax.vmap(jax.vmap(row_append, in_axes=(0, 0, 0)),
                      in_axes=(0, 0, None))
    k_rows = (jax.random.normal(ks[6], (L, B, kvd)) * 0.3).astype(
        jnp.bfloat16)

    @jax.jit
    def append_chain(sk, sv, pos):
        def body(i, c):
            sk, sv, ps = c
            sk = append(sk, k_rows, ps)
            sv = append(sv, k_rows, ps)
            return (sk, sv, ps + 1)
        sk, sv, _ = jax.lax.fori_loop(0, S, body, (sk, sv, pos))
        return sk[0, 0, 0, 0] + sv[0, 0, 0, 0]

    dt_append = timed(append_chain, sk, sv, pos, land=lambda o: o)

    # c) the real segment body (kernel + appends + bookkeeping)
    small = SmallState(
        prev=prev, pos=pos,
        active=jnp.ones((B,), jnp.bool_),
        finished=jnp.zeros((B,), jnp.bool_),
        tokens=jnp.zeros((B, T), jnp.int32),
        lp_sum=jnp.zeros((B,), jnp.float32),
        count=jnp.zeros((B,), jnp.int32),
    )
    cache = {"self_k": sk, "self_v": sv, "cross_k": ck, "cross_v": cv}

    @jax.jit
    def segment(small, cache, n):
        s, c = decode_segment_fused(stacked, cfg, small, cache, n, L_enc,
                                    block_b=args.block_b,
                                    t_active=t_active)
        return s.lp_sum.sum() + c["self_k"][0, 0, 0, 0].astype(jnp.float32)

    @jax.jit
    def segment_ring(small, cache, n):
        s, c = decode_segment_fused(stacked, cfg, small, cache, n, L_enc,
                                    ring_s=S, block_b=args.block_b,
                                    t_active=t_active)
        return s.lp_sum.sum() + c["self_k"][0, 0, 0, 0].astype(jnp.float32)

    nsteps = jnp.int32(S)
    dt_segment = timed(segment, small, cache, nsteps, land=lambda o: o)
    dt_ring = timed(segment_ring, small, cache, nsteps, land=lambda o: o)

    out = {
        "slots": B, "steps_per_segment": S,
        "block_b": args.block_b, "t_active": args.t_active or None,
        "kernel_only_ms_per_step": round(dt_kernel / S * 1e3, 3),
        "appends_only_ms_per_step": round(dt_append / S * 1e3, 3),
        "full_segment_ms_per_step": round(dt_segment / S * 1e3, 3),
        "ring_segment_ms_per_step": round(dt_ring / S * 1e3, 3),
        "residual_ms_per_step": round(
            (dt_segment - dt_kernel - dt_append) / S * 1e3, 3),
        "hbm_floor_note": ("full-cache+weight reads ~0.15 ms/step at 64 "
                           "MHA rows, T=150"),
    }
    print(json.dumps(out, indent=2))
    suffix = ""
    if args.block_b != 16 or args.t_active:
        suffix = f"_b{args.block_b}" + (
            f"_t{args.t_active}" if args.t_active else "")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"probe_ragged_split_results{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
