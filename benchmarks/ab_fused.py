"""A/B/A: XLA decode vs fused megakernel (v2 / v1) at batch 10, flagship.

Elision-proof accumulator timing (bench.py methodology); run serialized in
one quiet window. Prints one JSON line per arm and an A/B summary.

Usage: python benchmarks/ab_fused.py [--iters 15] [--arms xla,v2,v1,xla]
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

BATCH = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--arms", default="xla,v2,xla,v1,xla")
    ap.add_argument("--batch", type=int, default=BATCH)
    args = ap.parse_args()
    batch = args.batch

    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.decode.fused import greedy_decode_fused
    from handwritten_math_ocr_api_tpu.decode.greedy import greedy_decode
    from handwritten_math_ocr_api_tpu.models import model as model_mod
    from handwritten_math_ocr_api_tpu.models.model import init_model
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        build_stacked, build_stacked_full, quantize_stacked,
    )

    cfg = ModelConfig()
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    stacked = build_stacked(params["decoder"], cfg)
    stacked_q = quantize_stacked(stacked)
    stacked_full = build_stacked_full(params["decoder"], cfg)

    def resident():
        from handwritten_math_ocr_api_tpu.ops.whole_decode import (
            build_resident,
        )
        return build_resident(params["decoder"], cfg, quantize=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(
        (batch, cfg.img_h, cfg.img_w, 1)).astype(np.float32))
    eos_unreachable = cfg.vocab_size + 1

    @jax.jit
    def decode_xla(params, images):
        memory, _ = model_mod.encode(params, state, cfg, images)
        return greedy_decode(params["decoder"], cfg, memory,
                             cfg.max_seq_len, eos_id=eos_unreachable)

    def make_fused(variant, stk):
        @jax.jit
        def decode_fused(params, stacked, images):
            memory, _ = model_mod.encode(params, state, cfg, images)
            return greedy_decode_fused(
                params["decoder"], stacked, cfg, memory, cfg.max_seq_len,
                eos_id=eos_unreachable, interpret=False, variant=variant)

        return lambda: decode_fused(params, stk, images)

    arms = {
        "xla": lambda: decode_xla(params, images),
        "v2": make_fused("v2", stacked),     # elementwise attention (default)
        "v2m": make_fused("v2m", stacked),   # batched-MXU attention A/B
        "v2q": make_fused("v2", stacked_q),  # int8 weights in-kernel
        "v1": make_fused("v1", stacked),
        "v3": make_fused("v3", stacked_full),  # whole-step, batch-major
        "v4": make_fused("v4", stacked_full),  # whole-step, time-major
        "v5": make_fused("v5", resident()),    # whole-DECODE, int8-resident
    }

    results = []
    for arm in args.arms.split(","):
        fn = arms[arm]
        r = fn()
        float(np.asarray(r.logprob_sum.sum()))  # compile + real fetch
        total = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn()
            total = total + r.logprob_sum.sum()
        assert np.isfinite(float(total))
        dt = (time.perf_counter() - t0) / args.iters
        res = {"arm": arm, "batch": batch,
               "ms_per_batch": round(dt * 1e3, 2),
               "imgs_per_sec": round(batch / dt, 2),
               "us_per_step": round(dt * 1e6 / cfg.max_seq_len, 1)}
        results.append(res)
        print(json.dumps(res), flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "ab_fused_results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
