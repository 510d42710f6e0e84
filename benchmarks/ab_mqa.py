"""Decode-speed A/B: MHA vs grouped/multi-query attention (nhead_kv).

MQA shrinks the decode self-KV cache nhead/nhead_kv x — the dominant
per-step HBM stream of the XLA decode path. Random weights, unreachable
<eos> (worst-case full decode), device-chained timing (tunnel dispatch
paid once per chain).

Usage: python benchmarks/ab_mqa.py [--arms mha,gqa2,mqa] [--batch 10]
       [--chain 8]
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

KV = {"mha": None, "gqa2": 2, "mqa": 1,
      "mha_fused": None, "mqa_fused": 1}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="mha,gqa2,mqa")
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.decode.fused import greedy_decode_fused
    from handwritten_math_ocr_api_tpu.decode.greedy import greedy_decode
    from handwritten_math_ocr_api_tpu.models import model as model_mod
    from handwritten_math_ocr_api_tpu.models.model import init_model
    from handwritten_math_ocr_api_tpu.ops.fused_step import build_stacked

    rng = np.random.default_rng(0)
    results = []
    for arm in args.arms.split(","):
        cfg = ModelConfig(nhead_kv=KV[arm])
        params, state = init_model(jax.random.PRNGKey(0), cfg)
        fused = arm.endswith("_fused")
        stacked = build_stacked(params["decoder"], cfg) if fused else None
        images = jnp.asarray(rng.standard_normal(
            (args.batch, cfg.img_h, cfg.img_w, 1)).astype(np.float32))

        def raw(params, images, _cfg=cfg, _state=state, _st=stacked,
                _fused=fused):
            memory, _ = model_mod.encode(params, _state, _cfg, images)
            if _fused:
                return greedy_decode_fused(
                    params["decoder"], _st, _cfg, memory, _cfg.max_seq_len,
                    eos_id=_cfg.vocab_size + 1, interpret=False)
            return greedy_decode(params["decoder"], _cfg, memory,
                                 _cfg.max_seq_len,
                                 eos_id=_cfg.vocab_size + 1)

        @jax.jit
        def chained(params, images, _raw=raw):
            def body(i, acc):
                r = _raw(params, images + 0.0 * acc)
                return acc + r.logprob_sum.sum()
            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0.0))

        assert np.isfinite(float(np.asarray(chained(params, images))))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            assert np.isfinite(float(np.asarray(chained(params, images))))
            best = min(best, (time.perf_counter() - t0) / args.chain)
        res = {"arm": arm, "nhead_kv": KV[arm] or cfg.nhead,
               "batch": args.batch,
               "device_ms_per_decode": round(best * 1e3, 2),
               "device_us_per_step": round(best * 1e6 / cfg.max_seq_len, 1),
               "imgs_per_sec_device": round(args.batch / best, 1)}
        results.append(res)
        print(json.dumps(res), flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "ab_mqa_results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
