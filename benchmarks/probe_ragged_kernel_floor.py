"""Ragged-kernel floor probe: same grid + BlockSpecs, null body.

After the segment ring removed the per-step cache scatter, the ragged
kernel itself (0.64 ms/step at 64 MHA slots) dominates segment time at
~4x its ~0.17 ms memory floor. This measures where that goes by
compiling THE SAME (L, nB) grid with the same operand streams but a
trivial body:

  null      all operands streamed (weights + caches + ring), body only
            copies one lane -> pure launch + DMA time
  nocache   weights only (cache/ring specs dropped) -> launch + weight
            DMA
  full      the real fused_ragged_step (reference arm)

full - null ~= VPU/MXU compute + scheduling; null - nocache ~= cache
stream time. Usage: python benchmarks/probe_ragged_kernel_floor.py
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--ring", type=int, default=0,
                    help="ring extent streamed in the null arm (0 = off)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.models.decoder import (
        init_decoder_params,
    )
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        WEIGHT_KEYS, build_stacked_full, fused_ragged_step,
    )

    cfg = ModelConfig(vocab_size=600)
    key = jax.random.PRNGKey(0)
    params = init_decoder_params(key, cfg)
    stacked = build_stacked_full(params, cfg)
    B = args.slots
    Bc = 16
    nB = B // Bc
    L, D, kvd = cfg.num_decoder_layers, cfg.d_model, cfg.kv_dim
    T, L_enc, ff = cfg.max_seq_len, cfg.encoder_len, cfg.dim_feedforward
    S = args.ring

    ks = jax.random.split(key, 8)
    sk = (jax.random.normal(ks[0], (L, B, T, kvd)) * 0.3).astype(jnp.bfloat16)
    sv = (jax.random.normal(ks[1], (L, B, T, kvd)) * 0.3).astype(jnp.bfloat16)
    ck = (jax.random.normal(ks[2], (L, B, L_enc, D)) * 0.3).astype(
        jnp.bfloat16)
    cv = (jax.random.normal(ks[3], (L, B, L_enc, D)) * 0.3).astype(
        jnp.bfloat16)
    prev = jax.random.randint(ks[4], (B,), 4, 600).astype(jnp.int32)
    pos = jax.random.randint(ks[5], (B,), 0, 60).astype(jnp.int32)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda l, b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, b: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer_chunk(shape):
        return pl.BlockSpec((1, Bc) + shape,
                            lambda l, b: (l, b) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    w_dims = {"w_qkv": (D, 2 * kvd + D), "w_out": (D, D), "w_cq": (D, D),
              "w_co": (D, D), "w_ff1": (D, ff), "w_ff2": (ff, D)}
    weight_specs, weight_args = [], []
    for k in WEIGHT_KEYS:
        weight_specs.append(per_layer(w_dims[k]))
        weight_args.append(stacked[k])
        weight_specs.append(per_layer((1, w_dims[k][1])))
        weight_args.append(stacked["b" + k[1:]])

    def make_null(with_cache: bool):
        cache_specs, cache_args = [], []
        if with_cache:
            cache_specs = [per_layer_chunk((T, kvd)),
                           per_layer_chunk((T, kvd)),
                           per_layer_chunk((L_enc, D)),
                           per_layer_chunk((L_enc, D))]
            cache_args = [sk, sv, ck, cv]
            if S:
                rk = jnp.zeros((L, B, S, kvd), jnp.bfloat16)
                cache_specs += [per_layer_chunk((S, kvd))] * 2
                cache_args += [rk, rk]

        def body(*refs):
            c_in = refs[0]
            out = refs[-1]
            # Blocks are DMA'd per the BlockSpecs regardless of body use;
            # the carried input defeats CSE/hoisting when chained
            acc = jnp.sum(refs[1][0].astype(jnp.float32))
            out[:] = c_in[:] + acc * 1e-30

        f = pl.pallas_call(
            body,
            grid=(L, nB),
            in_specs=[pl.BlockSpec((Bc, 1), lambda l, b: (b, 0),
                                   memory_space=pltpu.VMEM)]
            + weight_specs + cache_specs,
            out_specs=pl.BlockSpec((Bc, 1), lambda l, b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )

        # chain CHAIN_STEPS calls in one dispatch so per-call tunnel
        # dispatch cost is amortized exactly like the segment scan
        @jax.jit
        def run(c0):
            def step(i, c):
                return f(c, *weight_args, *cache_args)
            return jax.lax.fori_loop(0, CHAIN, step, c0).sum()
        return run

    CHAIN = 16
    c0 = jnp.zeros((B, 1), jnp.float32)

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
        return (time.perf_counter() - t0) / args.iters / CHAIN

    @jax.jit
    def full(prev, pos):
        def step(i, c):
            pv, ps, acc = c
            nxt, logp, k_rows, v_rows = fused_ragged_step(
                stacked, cfg, pv, ps, sk, sv, ck, cv, L_enc)
            return (nxt, ps + 1, acc + logp.sum())
        _, _, acc = jax.lax.fori_loop(0, CHAIN, step,
                                      (prev, pos, jnp.float32(0)))
        return acc

    res = {
        "slots": B,
        "chain": CHAIN,
        "null_launch_weight_dma_ms": round(
            timed(make_null(False), c0) * 1e3, 3),
        "null_plus_cache_dma_ms": round(
            timed(make_null(True), c0) * 1e3, 3),
        "full_kernel_ms": round(timed(full, prev, pos) * 1e3, 3),
    }
    res["cache_dma_ms"] = round(
        res["null_plus_cache_dma_ms"] - res["null_launch_weight_dma_ms"], 3)
    res["compute_sched_ms"] = round(
        res["full_kernel_ms"] - res["null_plus_cache_dma_ms"], 3)
    print(json.dumps(res, indent=2))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_ragged_kernel_floor_results.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
