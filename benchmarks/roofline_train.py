"""Training-step roofline: achieved FLOP/s and img/s vs batch size.

The encoder roofline (roofline_encoder.py) showed batching — not hand
kernels — is the winning lever on Swin-T's small-matmul shapes. The
training step should follow the same curve: the round-2/3 production runs
used the reference's batch 64 (reference src/config.py:35) at ~97.5 ms
(656 img/s); this measures how far larger batches push per-chip training
throughput and what MFU the step actually achieves.

FLOP inventory: analytic forward FLOPs (encoder from
roofline_encoder.swin_flops + teacher-forced decoder below), training
step counted as 3x forward (fwd + ~2x bwd; `--remat` adds one extra fwd
for rematerialized activations — reported separately as mfu_remat).

Usage: python benchmarks/roofline_train.py [--batches 64,128,256,512]
Writes benchmarks/roofline_train_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from roofline_encoder import PEAK_TFLOPS_BF16, swin_flops  # noqa: E402


def decoder_flops(cfg, vocab: int) -> int:
    """Analytic forward FLOPs per image, teacher-forced decode over the
    full padded length (multiply-add = 2 FLOPs)."""
    T = cfg.max_seq_len - 1  # captions[:, :-1]
    d = cfg.d_model
    f = cfg.dim_feedforward
    M = cfg.encoder_len
    per_layer = (
        2 * T * d * 3 * d        # self qkv
        + 2 * T * T * d * 2      # self scores + values (full causal extent)
        + 2 * T * d * d          # self out proj
        + 2 * T * d * d          # cross q
        + 2 * M * d * 2 * d      # cross kv
        + 2 * T * M * d * 2      # cross scores + values
        + 2 * T * d * d          # cross out proj
        + 2 * T * d * f * 2      # mlp fc1 + fc2
    )
    return cfg.num_decoder_layers * per_layer + 2 * T * d * vocab  # + head


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,256,512")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=600)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import (
        Config, ModelConfig)
    from handwritten_math_ocr_api_tpu.train.step import (
        create_train_state, make_train_step)

    cfg = ModelConfig(vocab_size=args.vocab)
    train_cfg = Config().train
    state, optimizer = create_train_state(jax.random.PRNGKey(0), cfg,
                                          train_cfg)
    step = make_train_step(cfg, train_cfg, optimizer)

    fwd = swin_flops(cfg)["flops_per_image"] + decoder_flops(cfg,
                                                             args.vocab)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        # uint8 images: the production path (on-device augment+normalize
        # fused into the step, reference src/data_loader.py:51)
        imgs = jnp.asarray(rng.integers(0, 255,
                                        (b, cfg.img_h, cfg.img_w, 1),
                                        np.uint8))
        caps = jnp.asarray(rng.integers(4, args.vocab,
                                        (b, cfg.max_seq_len), np.int32))
        st = jax.tree_util.tree_map(jnp.copy, state)
        try:
            st, m = step(st, imgs, caps, key)  # compile
            float(m["loss"])
        except Exception as e:  # HBM OOM etc. — record and keep sweeping
            msg = str(e)
            rows.append({"batch": b, "error": msg[:200]
                         + ("..." if len(msg) > 200 else "")})
            print(json.dumps(rows[-1]), flush=True)
            continue
        for _ in range(3):  # pre-roll
            st, m = step(st, imgs, caps, key)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, m = step(st, imgs, caps, key)
        assert np.isfinite(float(m["loss"]))
        dt = (time.perf_counter() - t0) / args.iters
        gflop_train = 3 * fwd * b / 1e9
        rows.append({
            "batch": b,
            "ms": round(dt * 1e3, 1),
            "img_per_s": round(b / dt, 1),
            "achieved_tflops_3x_fwd": round(gflop_train / dt / 1e3, 2),
            "mfu_pct": round(
                100 * gflop_train / dt / 1e3 / PEAK_TFLOPS_BF16, 2),
            "mfu_remat_pct": round(
                100 * (4 / 3) * gflop_train / dt / 1e3 / PEAK_TFLOPS_BF16,
                2) if train_cfg.remat else None,
        })
        print(json.dumps(rows[-1]), flush=True)
        del st

    out = {
        "fwd_gflop_per_image": round(fwd / 1e9, 3),
        "train_flops_model": "3x forward (fwd + ~2x bwd)",
        "remat": bool(train_cfg.remat),
        "peak_tflops_bf16": PEAK_TFLOPS_BF16,
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline_train_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"metric": "train_roofline",
                      "fwd_gflop_per_image": out["fwd_gflop_per_image"]}))


if __name__ == "__main__":
    main()
