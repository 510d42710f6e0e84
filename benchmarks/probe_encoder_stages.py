"""Per-stage timing attribution for the Swin-T encoder.

Round-2 close-out: Swin encode is 4.39 ms at batch 10 (~3% MFU) and 44%
of end-to-end decode, but nothing says WHERE inside the trunk the time
goes. This probe jits each pipeline piece separately — patch embed, each
stage's block stack, each patch merging — and times them with the same
elision-proof chained accumulator as bench.py (every iteration's output
feeds the next iteration's input; one terminal fetch).

Per-piece wall time slightly over-counts vs the fused whole-trunk jit
(XLA can overlap pieces there), so treat the split as attribution of
relative cost, and compare the sum against the whole-trunk time printed
last.

Usage: python benchmarks/probe_encoder_stages.py [--batch 10] [--iters 30]
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
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=320)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.models.swin import (
        init_swin_params, patch_embed, patch_merging, swin_apply, swin_block,
    )

    cfg = ModelConfig().swin
    params = init_swin_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    ws = cfg.window_size

    def stage_fn(i, x, params):
        stage = params["stages"][i]
        for d in range(cfg.depths[i]):
            shift = 0 if d % 2 == 0 else ws // 2
            x = swin_block(stage["blocks"][d], x, ws, shift,
                           cfg.num_heads[i], cfg.mlp_ratio)
        return x

    def time_fn(fn, x, iters):
        """Device-chained timing: a single jitted lax.fori_loop runs the
        piece `iters` times, mixing a 0-valued scalar of each output back
        into the next input so iterations cannot be elided or reordered.
        One dispatch + one fetch total — tunnel RTT does not contaminate
        per-iteration time (the old eager scalar-chain paid ~1 RTT per
        iteration, inflating every piece by 15-90 ms)."""

        def body(_, carry):
            out = fn(carry)
            z = jnp.sum(out).astype(carry.dtype) * 0
            return carry + z

        chained = jax.jit(
            lambda x0: jax.lax.fori_loop(0, iters, body, x0))
        jax.block_until_ready(chained(x))   # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        return (time.perf_counter() - t0) / iters

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.standard_normal(
            (args.batch, args.height, args.width, 1)), jnp.bfloat16)

    res = {"batch": args.batch, "pieces_ms": {}}
    x = img
    t = time_fn(functools.partial(patch_embed, params["patch_embed"]), x,
                args.iters)
    res["pieces_ms"]["patch_embed"] = round(1e3 * t, 3)
    x = jax.jit(functools.partial(patch_embed, params["patch_embed"]))(x)
    for i in range(len(cfg.depths)):
        t = time_fn(functools.partial(stage_fn, i, params=params), x,
                    args.iters)
        res["pieces_ms"][f"stage{i}_blocks{cfg.depths[i]}"] = round(
            1e3 * t, 3)
        x = jax.jit(functools.partial(stage_fn, i, params=params))(x)
        if i < len(cfg.depths) - 1:
            t = time_fn(
                functools.partial(patch_merging, params["merges"][i]), x,
                args.iters)
            res["pieces_ms"][f"merge{i}"] = round(1e3 * t, 3)
            x = jax.jit(
                functools.partial(patch_merging, params["merges"][i]))(x)

    t = time_fn(lambda im: swin_apply(params, im, cfg), img, args.iters)
    res["whole_trunk_ms"] = round(1e3 * t, 3)
    t = time_fn(lambda im: swin_apply(params, im, cfg,
                                      use_pallas_block=True),
                img, args.iters)
    res["whole_trunk_fused_blocks_ms"] = round(1e3 * t, 3)
    res["pieces_sum_ms"] = round(sum(res["pieces_ms"].values()), 3)
    for k, v in res["pieces_ms"].items():
        print(f"{k:18s}: {v:8.3f} ms")
    print(f"{'sum of pieces':18s}: {res['pieces_sum_ms']:8.3f} ms")
    print(f"{'whole trunk':18s}: {res['whole_trunk_ms']:8.3f} ms")
    print(f"{'trunk fused blocks':18s}: "
          f"{res['whole_trunk_fused_blocks_ms']:8.3f} ms")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
