"""A/B/A: beam decode with per-step cache reorder vs ancestry indirection.

Round-2 anatomy (BENCHMARKS.md): the reorder beam runs ~13.4 ms/step at
B=64 K=5, of which ~2.4 ms is the physical KV reorder (~420 MB/step moved)
and ~8 ms was unattributed scheduling. The indirection variant keeps a
(B, K, T) parent table and steers attention reads through it — writes
never move. This measures both, A/B/A, elision-proof.

Usage: python benchmarks/ab_beam.py [--batch 64] [--beam 5] [--iters 6]
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
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.decode.beam import (
        beam_decode, beam_decode_indirect,
    )
    from handwritten_math_ocr_api_tpu.decode.fused import beam_decode_fused
    from handwritten_math_ocr_api_tpu.models import decoder as dec
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        build_stacked_full,
    )

    cfg = ModelConfig()
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    stacked = build_stacked_full(params, cfg)
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal(
        (args.batch, cfg.encoder_len, cfg.d_model)), jnp.float32)
    eos = cfg.vocab_size + 1  # unreachable: worst-case full 150 steps

    fns = {
        "reorder": jax.jit(lambda p, m: beam_decode(
            p, cfg, m, beam_size=args.beam, eos_id=eos)),
        "indirect": jax.jit(lambda p, m: beam_decode_indirect(
            p, cfg, m, beam_size=args.beam, eos_id=eos)),
        "fused": jax.jit(lambda p, m: beam_decode_fused(
            p, stacked, cfg, m, beam_size=args.beam, eos_id=eos)),
    }

    def timed(f):
        r = f(params, memory)
        np.asarray(r.scores)  # compile + land
        total = jnp.float32(0.0)
        for _ in range(2):  # pre-roll
            total = total + f(params, memory).scores.sum()
        assert np.isfinite(float(total))
        total = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            total = total + f(params, memory).scores.sum()
        assert np.isfinite(float(total))
        return (time.perf_counter() - t0) / args.iters

    out = {}
    # A/B/A: reorder, indirect, fused, reorder again (QoS drift check)
    for name in ("reorder", "indirect", "fused", "reorder2"):
        f = fns["reorder" if name.startswith("reorder") else name]
        dt = timed(f)
        out[name] = round(dt * 1e3, 1)
        print(f"{name}: {dt * 1e3:.1f} ms / batch-{args.batch} "
              f"beam-{args.beam} decode "
              f"({dt * 1e6 / cfg.max_seq_len:.0f} us/step, "
              f"{args.batch / dt:.1f} img/s)", flush=True)

    res = {
        "metric": f"beam{args.beam}_batch{args.batch}_ab",
        "ms": out,
        "img_per_s": {k: round(args.batch / (v / 1e3), 1)
                      for k, v in out.items()},
    }
    print(json.dumps(res))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ab_beam_results.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
