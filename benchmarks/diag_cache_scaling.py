"""Diagnostic: does the fused decode kernel's per-step time scale with the
self-cache length it streams? Decides whether prefix-limited cache DMA
(online-softmax v3) would pay.

Runs the fused greedy decode at several max_len settings (the kernel
streams the FULL (B, T, D) cache blocks every step regardless of pos) and
reports per-step time. Strong T-dependence => cache-DMA-bound => a
prefix-limited kernel saves ~half the traffic on average; flat =>
latency/compute-bound => v3 is not worth building.
"""

from __future__ import annotations

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
    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.decode.fused import greedy_decode_fused
    from handwritten_math_ocr_api_tpu.models import model as model_mod
    from handwritten_math_ocr_api_tpu.models.model import init_model
    from handwritten_math_ocr_api_tpu.ops.fused_step import build_stacked

    cfg = ModelConfig()
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    stacked = build_stacked(params["decoder"], cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(
        (BATCH, cfg.img_h, cfg.img_w, 1)).astype(np.float32))

    for max_len in (32, 64, 96, 150):
        @jax.jit
        def decode(params, stacked, images, _ml=max_len):
            memory, _ = model_mod.encode(params, state, cfg, images)
            return greedy_decode_fused(
                params["decoder"], stacked, cfg, memory, _ml,
                eos_id=cfg.vocab_size + 1, interpret=False)

        r = decode(params, stacked, images)
        float(np.asarray(r.logprob_sum.sum()))
        # pre-roll past the tunnel's slow first stretch
        total = jnp.float32(0.0)
        for _ in range(8):
            total = total + decode(params, stacked, images).logprob_sum.sum()
        assert np.isfinite(float(total))
        total = jnp.float32(0.0)
        iters = 12
        t0 = time.perf_counter()
        for _ in range(iters):
            total = total + decode(params, stacked, images).logprob_sum.sum()
        assert np.isfinite(float(total))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "max_len": max_len,
            "cache_T": -(-max_len // 16) * 16,
            "ms_per_decode": round(dt * 1e3, 2),
            "us_per_step": round(dt * 1e6 / max_len, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
