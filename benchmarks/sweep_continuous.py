"""Sweep the pipelined continuous-batching scheduler on the real chip:
pipeline depth x segment length x slot count, measuring throughput,
occupancies and forced-harvest blocking — no HTTP layer, isolating the
scheduler + device loop from serving overhead.

Usage: python benchmarks/sweep_continuous.py [--requests 256]
       [--grid "48:16:4,48:16:8,..."]   (slots:segment:depth)
Writes benchmarks/sweep_continuous_results.json.
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
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--grid",
                    default="63:16:4,63:16:8,47:16:4,64:16:4,63:32:4")
    ap.add_argument("--fused", action="store_true",
                    help="whole-step ragged Pallas megakernel segments")
    ap.add_argument("--block-b", type=int, default=16,
                    help="fused kernel batch-chunk rows (pool pads to it)")
    ap.add_argument("--no-ring", action="store_true",
                    help="disable the segment ring buffer (A/B arm)")
    ap.add_argument("--harvest-threads", type=int, default=0,
                    help="report-fetch threads (0 = pipeline depth; 1 = "
                         "round-3 serialized-fetch behavior, the A arm)")
    ap.add_argument("--out", default="sweep_continuous_results.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import EOS_ID, ModelConfig
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode.continuous import (
        ContinuousDecoder,
    )
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig()
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    # worst case: <eos> unreachable -> every request decodes 150 steps
    params["decoder"]["fc_out"]["b"] = (
        params["decoder"]["fc_out"]["b"].at[EOS_ID].set(jnp.float32(-1e9)))
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    tok = Tokenizer(vocab)
    rng = np.random.default_rng(0)
    images = [rng.standard_normal((cfg.img_h, cfg.img_w, 1)).astype(
        np.float32) for _ in range(args.requests)]

    results = []
    for spec in args.grid.split(","):
        slots, seg, depth = (int(x) for x in spec.strip().split(":"))
        cont = ContinuousDecoder(params, state, cfg, tok, num_slots=slots,
                                 segment_steps=seg, pipeline_depth=depth,
                                 use_fused=args.fused,
                                 fused_block_b=args.block_b,
                                 segment_ring=not args.no_ring,
                                 harvest_threads=args.harvest_threads)
        cont.warmup()  # compile insert buckets + segment + scalars
        t0 = time.perf_counter()
        cont.run_all(images)
        dt = time.perf_counter() - t0
        st = cont.stats
        row = {
            "slots": slots, "segment_steps": seg, "pipeline_depth": depth,
            "harvest_threads": cont.harvest_threads,
            "fused": args.fused, "block_b": args.block_b,
            "segment_ring": cont.segment_ring,
            "img_per_s": round(args.requests / dt, 2),
            "elapsed_s": round(dt, 3),
            "segments": st["segments_run"],
            "ms_per_segment": round(1e3 * dt / max(st["segments_run"], 1),
                                    2),
            "avg_occupancy": round(st["avg_occupancy"], 3),
            "work_occupancy": round(st["work_occupancy"], 3),
            "harvest_blocks": st["harvest_blocks"],
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       args.out)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
