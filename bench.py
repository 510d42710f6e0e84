"""Headline benchmark: batch-10 greedy decode throughput on one TPU chip.

This is BASELINE.json config 3 ("Batch-10 padded /predict/batch decode with
KV cache, greedy, v5e-1"). The reference baseline is the CPU serving path:
~350 ms/image greedy decode (README.md:87), and /predict/batch processed
its images *sequentially* (app/src/main.py:546) => ~2.857 img/s. The
north-star target is >=50x that (~143 img/s) on v5e-1.

Random weights decode to max_seq_len (no early <eos>), so the measured
number is the worst-case full-150-step decode — conservative vs production.

Decode path: the fused decoder-layer Pallas megakernel (v2, compute-only;
ops/fused_step.py), the serving-configurable fast path
(SERVING_USE_FUSED=1) — measured ~2x XLA's decode schedule on v5e
(benchmarks/ab_fused.py). Set MATHOCR_BENCH_XLA=1 to measure the default
XLA path instead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# persistent XLA compilation cache: repeat bench runs skip the ~minutes-long
# first compile (must be set before jax initializes its backend)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_IMGS_PER_SEC = 1.0 / 0.350  # reference ~350 ms/image on CPU

BATCH = 10
ITERS = 20


def main() -> None:
    import jax

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.decode.greedy import greedy_decode
    from handwritten_math_ocr_api_tpu.models import model as model_mod
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig()  # flagship Swin-T + 8-layer decoder, bf16
    params, state = init_model(jax.random.PRNGKey(0), cfg)

    use_xla = os.environ.get("MATHOCR_BENCH_XLA", "0") == "1"
    if not use_xla:
        from handwritten_math_ocr_api_tpu.decode.fused import (
            greedy_decode_fused,
        )
        from handwritten_math_ocr_api_tpu.ops.fused_step import build_stacked

        stacked = build_stacked(params["decoder"], cfg)

    # Force the full 150-step decode (random weights could emit <eos>
    # immediately and fake the number): unreachable eos id => every image
    # pays the worst-case decode cost.
    @jax.jit
    def decode(params, images):
        memory, _ = model_mod.encode(params, state, cfg, images)
        if use_xla:
            return greedy_decode(params["decoder"], cfg, memory,
                                 cfg.max_seq_len, eos_id=cfg.vocab_size + 1)
        return greedy_decode_fused(
            params["decoder"], stacked, cfg, memory, cfg.max_seq_len,
            eos_id=cfg.vocab_size + 1, interpret=False)

    rng = np.random.default_rng(0)
    images = jax.numpy.asarray(rng.standard_normal(
        (BATCH, cfg.img_h, cfg.img_w, 1)).astype(np.float32))

    # warmup / compile
    res = decode(params, images)
    jax.block_until_ready(res.tokens)
    steps = np.asarray(res.token_count)  # emitted non-eos tokens per row
    assert (steps == cfg.max_seq_len).all(), steps

    # Elision-proof timing: every iteration's decode feeds an accumulator
    # fetched ONCE at the end — async runtimes cannot skip or defer any
    # decode, and no mid-loop host round-trips pollute the measurement.
    import jax.numpy as jnp

    # Pre-roll: the first post-compile stretch through the axon tunnel runs
    # 4-5x slower than steady state (program upload / QoS ramp); run it
    # untimed, and use its rate to bound the timed iteration count when the
    # pool is congested.
    t0 = time.perf_counter()
    total = jnp.float32(0.0)
    for _ in range(10):
        total = total + decode(params, images).logprob_sum.sum()
    assert np.isfinite(float(total))
    per_iter = (time.perf_counter() - t0) / 10
    done = max(5, min(ITERS, int(60.0 / max(per_iter, 1e-3))))

    total = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(done):
        total = total + decode(params, images).logprob_sum.sum()
    assert np.isfinite(float(total))  # single terminal fetch
    elapsed = time.perf_counter() - t0

    # throughput = images decoded / wall-clock. (Round-1 bug: this
    # multiplied by ITERS on top of per-iteration time, inflating 20x.)
    imgs_per_sec = BATCH * done / elapsed
    print(json.dumps({
        "metric": "batch10_greedy_decode_throughput_v5e1",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
