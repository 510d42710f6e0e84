"""Split the batch-10 fused decode's fixed cost: encoder forward vs the
decode loop. The cache-scaling diagnostic (diag_cache_scaling.py) fits a
~4.9 ms per-decode constant on top of ~39 us/step marginal cost; this
measures the encoder alone to attribute it.
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


def timed(fn, *args, iters=16, preroll=8):
    import jax
    import jax.numpy as jnp

    total = jnp.float32(0.0)
    for _ in range(preroll):
        total = total + fn(*args)
    assert np.isfinite(float(total))
    total = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        total = total + fn(*args)
    assert np.isfinite(float(total))
    return (time.perf_counter() - t0) / iters


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

    @jax.jit
    def encode_only(params, images):
        memory, _ = model_mod.encode(params, state, cfg, images)
        return memory.sum()

    @jax.jit
    def encode_pallas(params, images):
        memory, _ = model_mod.encode(params, state, cfg, images,
                                     use_pallas=True)
        return memory.sum()

    @jax.jit
    def full(params, stacked, images):
        memory, _ = model_mod.encode(params, state, cfg, images)
        r = greedy_decode_fused(
            params["decoder"], stacked, cfg, memory, cfg.max_seq_len,
            eos_id=cfg.vocab_size + 1, interpret=False)
        return r.logprob_sum.sum()

    memory, _ = jax.jit(
        lambda p, im: model_mod.encode(p, state, cfg, im))(params, images)
    memory = jax.block_until_ready(memory)

    @jax.jit
    def decode_only(params, stacked, memory):
        r = greedy_decode_fused(
            params["decoder"], stacked, cfg, memory, cfg.max_seq_len,
            eos_id=cfg.vocab_size + 1, interpret=False)
        return r.logprob_sum.sum()

    enc = timed(encode_only, params, images)
    encp = timed(encode_pallas, params, images)
    dec = timed(decode_only, params, stacked, memory)
    tot = timed(full, params, stacked, images)
    out = {
        "batch": BATCH,
        "encode_ms": round(enc * 1e3, 2),
        "encode_pallas_ms": round(encp * 1e3, 2),
        "decode_loop_ms": round(dec * 1e3, 2),
        "full_ms": round(tot * 1e3, 2),
        "decode_us_per_step": round(dec * 1e6 / 150, 1),
    }
    print(json.dumps(out, indent=None), flush=True)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "encode_split_results.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
