"""Device-time A/B of decode variants: M full decodes chained in ONE jit
(lax.fori_loop), so tunnel dispatch is paid once — elapsed/M is a pure
device-time bound (the wall-clock ab_fused.py numbers sit on a ~3-4 ms
pipelined-dispatch floor that masks sub-floor differences).

Optionally captures a jax.profiler trace per arm and reports the top
device ops, attributing where each decode's microseconds go.

Usage: python benchmarks/ab_device.py [--arms xla,v2,v2m] [--chain 8]
       [--trace]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np  # noqa: E402


def top_ops_from_trace(out_dir: str, n_decodes: int):
    """Parse the jax.profiler xplane dump with jax's own ProfileData and
    aggregate device-op time. Returns per-decode busy time + top ops."""
    try:
        from jax.profiler import ProfileData
    except Exception:
        return None
    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None
    data = ProfileData.from_file(sorted(paths)[-1])
    best = 0.0
    top = None
    for plane in data.planes:
        name = plane.name.lower()
        if "tpu" not in name and "device" not in name:
            continue
        busy_ns = 0
        by_op = {}
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                busy_ns += dur
                by_op[ev.name] = by_op.get(ev.name, 0) + dur
        ms = busy_ns / 1e6 / n_decodes
        if ms > best:
            best = ms
            top = [{"op": k, "us_per_decode": round(v / 1e3 / n_decodes, 1)}
                   for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])
                   [:12]]
    if not best:
        return None
    return {"device_busy_ms_per_decode": round(best, 2), "top_ops": top}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="xla,v2,v2m")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

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
    stacked_full = build_stacked_full(params["decoder"], cfg)
    if "v5" in args.arms:
        from handwritten_math_ocr_api_tpu.ops.whole_decode import (
            build_resident,
        )
        resident = build_resident(params["decoder"], cfg, quantize=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(
        (args.batch, cfg.img_h, cfg.img_w, 1)).astype(np.float32))
    eos_unreachable = cfg.vocab_size + 1

    def decode_raw(variant):
        def fn(params, images):
            memory, _ = model_mod.encode(params, state, cfg, images)
            if variant == "enc":  # encoder only, for trace attribution
                return type("R", (), {"logprob_sum": memory.sum()})
            if variant == "xla":
                return greedy_decode(params["decoder"], cfg, memory,
                                     cfg.max_seq_len, eos_id=eos_unreachable)
            stk = resident if variant == "v5" else (
                stacked_full if variant in ("v3", "v4") else (
                    quantize_stacked(stacked) if variant == "v2q"
                    else stacked))
            return greedy_decode_fused(
                params["decoder"], stk, cfg, memory, cfg.max_seq_len,
                eos_id=eos_unreachable, interpret=False,
                variant="v2" if variant == "v2q" else variant)
        return fn

    results = []
    for arm in args.arms.split(","):
        raw = decode_raw(arm)

        @jax.jit
        def chained(params, images, _raw=raw):
            def body(i, acc):
                res = _raw(params, images + 0.0 * acc)
                return acc + res.logprob_sum.sum()
            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0.0))

        assert np.isfinite(float(np.asarray(chained(params, images))))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            assert np.isfinite(float(np.asarray(chained(params, images))))
            best = min(best, (time.perf_counter() - t0) / args.chain)
        res = {"arm": arm, "batch": args.batch,
               "device_ms_per_decode": round(best * 1e3, 2),
               "device_us_per_step": round(best * 1e6 / cfg.max_seq_len, 1),
               "imgs_per_sec_device": round(args.batch / best, 1)}
        if args.trace:
            tdir = f"/tmp/ab_device_trace_{arm}"
            with jax.profiler.trace(tdir):
                assert np.isfinite(
                    float(np.asarray(chained(params, images))))
            res["trace"] = top_ops_from_trace(tdir, args.chain)
        results.append(res)
        print(json.dumps(res), flush=True)

    with open(os.path.join(HERE, "ab_device_results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
