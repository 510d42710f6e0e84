"""MQA capacity demonstration, end-to-end on trained checkpoints.

The claim (BENCHMARKS.md): nhead_kv=1 shrinks the decode self-KV cache 8x,
so a continuous-batching server can hold ~8x more slots per chip at equal
cache HBM. This runs the *trained* MHA and MQA flagship checkpoints
through the continuous engine on real corpus renders (real <eos>, ragged
lengths) with slot counts chosen for EQUAL self-KV-cache bytes, and
records throughput + occupancy + cache bytes.

Usage: python benchmarks/mqa_capacity.py [--requests 512]
       [--mha-slots 56] (mqa slots = 8x)
Writes benchmarks/mqa_capacity_results.json.
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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_run(run_dir: str, nhead_kv, overrides=None, use_ema=False):
    import jax

    from handwritten_math_ocr_api_tpu.core.config import (
        Config, ModelConfig, SwinConfig,
    )
    from handwritten_math_ocr_api_tpu.core.tokenizer import (
        Tokenizer, load_vocab,
    )
    from handwritten_math_ocr_api_tpu.train.checkpoint import load_checkpoint
    from handwritten_math_ocr_api_tpu.train.step import create_train_state

    vocab, idx2char = load_vocab(os.path.join(run_dir, "vocab.json"))
    cfg = ModelConfig(vocab_size=len(vocab), nhead_kv=nhead_kv)
    if overrides:
        raw = dict(overrides)
        if "swin" in raw:
            cfg = cfg.replace(swin=SwinConfig(**raw.pop("swin")))
        cfg = cfg.replace(**raw)
    tc = Config().train
    if use_ema:
        import dataclasses
        tc = dataclasses.replace(tc, ema_decay=0.999)
    state, _ = create_train_state(jax.random.PRNGKey(0), cfg, tc)
    state, _ = load_checkpoint(run_dir, "best_model", state,
                               params_only=True)
    params = state.eval_params if use_ema else state.params
    return params, state.model_state, cfg, Tokenizer(vocab, idx2char)


def _cache_bytes(cfg, slots: int):
    """(self_kv_bytes, cross_kv_bytes) for a slot pool (bf16)."""
    dh, T, L = cfg.head_dim, cfg.max_seq_len, cfg.num_decoder_layers
    self_b = slots * cfg.kv_heads * T * dh * 2 * 2 * L
    cross_b = slots * cfg.nhead * cfg.encoder_len * dh * 2 * 2 * L
    return self_b, cross_b


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=2048,
                    help="must be >> mqa slots (8x mha) so both arms run "
                         "saturated, not feed-limited")
    ap.add_argument("--mha-slots", type=int, default=56)
    ap.add_argument("--mqa-slots", default="208,448",
                    help="comma list of MQA arm slot counts. 448 = 8x "
                         "mha-slots (equal SELF-KV cache HBM — what "
                         "nhead_kv=1 directly buys); 208 ~= equal TOTAL "
                         "decode-cache HBM (cross-KV keeps all 8 heads "
                         "and scales with slots in both arms)")
    ap.add_argument("--pipeline-depth", type=int, default=4,
                    help="segments in flight; 4 matches the BASELINE "
                         "config-5 harness. Depth 8 inflates harvest "
                         "staleness ~128 steps and cratered the first "
                         "run of this bench")
    ap.add_argument("--mha-run", default=os.path.join(
        ROOT, "runs", "stream_swin_r2"))
    ap.add_argument("--mqa-run", default=os.path.join(
        ROOT, "runs", "stream_swin_mqa"))
    ap.add_argument("--mqa-kv", type=int, default=1,
                    help="kv heads of the second arm's checkpoint (1 = "
                         "MQA; 2/4 = the GQA midpoints, round 5)")
    ap.add_argument("--arm-name", default=None,
                    help="label for the second arm (default mqa/gqaN)")
    ap.add_argument("--use-ema", action="store_true",
                    help="evaluate the EMA shadow of --ema-decay runs")
    ap.add_argument("--renderer", default="typeset",
                    choices=["typeset", "stroke"],
                    help="render the probe images the way the checkpoints "
                         "were trained (stroke for stream_swin_stroke runs)")
    ap.add_argument("--overrides", default=None,
                    help="JSON dict of ModelConfig overrides used at "
                         "training time (e.g. '{\"memory_norm\": true}'); "
                         "must match the checkpoint's param tree")
    args = ap.parse_args()
    overrides = json.loads(args.overrides) if args.overrides else None

    from handwritten_math_ocr_api_tpu.data.synthetic import (
        SyntheticStreamDataset, grammar_vocab,
    )
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode.continuous import (
        ContinuousDecoder,
    )

    # real corpus renders -> realistic ragged decode lengths (real eos)
    tok_g = Tokenizer(grammar_vocab())
    if args.renderer == "stroke":
        from handwritten_math_ocr_api_tpu.data.strokes import (
            StrokeStreamDataset,
        )
        ds = StrokeStreamDataset(tok_g, args.requests, seed=1234,
                                 freeze=True)
    else:
        ds = SyntheticStreamDataset(tok_g, args.requests, seed=1234,
                                    freeze=True)
    images = []
    for i in range(args.requests):
        img, _, _ = ds[i]
        images.append(img.astype(np.float32)[..., None] / 127.5 - 1.0)

    arm2 = args.arm_name or ("mqa" if args.mqa_kv == 1
                             else f"gqa{args.mqa_kv}")
    arms = [("mha", args.mha_run, None, args.mha_slots)]
    arms += [(arm2, args.mqa_run, args.mqa_kv, int(s))
             for s in args.mqa_slots.split(",")]
    results = []
    for name, run_dir, kv, slots in arms:
        params, mstate, cfg, tok = _load_run(run_dir, kv, overrides,
                                             use_ema=args.use_ema)
        self_b, cross_b = _cache_bytes(cfg, slots)

        def make():
            return ContinuousDecoder(
                params, mstate, cfg, tok, num_slots=slots,
                segment_steps=16, pipeline_depth=args.pipeline_depth,
                encode_buckets=(1, 2, 4, 8, 16, 32, 64))

        # Warm until every chunk/bucket shape is compiled: fill the pool
        # completely once, then drain through every smaller chunk count.
        # (The first run of this bench warmed with 64 images on a
        # 448-slot pool and paid ~2.6 s/segment of fresh compiles inside
        # the timed region.)
        make().run_all(images[:min(len(images), slots + 64)])
        cont = make()
        t0 = time.perf_counter()
        outs = cont.run_all(images)
        dt = time.perf_counter() - t0
        st = cont.stats
        nonempty = sum(1 for latex, _ in outs if latex and "Unable" not in
                       latex)
        row = {
            "arm": name, "slots": slots, "kv_heads": cfg.kv_heads,
            "img_per_s": round(args.requests / dt, 2),
            "elapsed_s": round(dt, 2),
            "self_kv_mb": round(self_b / 2**20, 1),
            "cross_kv_mb": round(cross_b / 2**20, 1),
            "total_cache_mb": round((self_b + cross_b) / 2**20, 1),
            "avg_occupancy": round(st["avg_occupancy"], 3),
            "work_occupancy": round(st["work_occupancy"], 3),
            "segments": st["segments_run"],
            "nonempty_results": nonempty,
            # phase attribution (VERDICT r5 item 6: where does the
            # work-occupancy collapse at high slot counts come from?)
            "t_admit_s": st.get("t_admit_s"),
            "t_dispatch_s": st.get("t_dispatch_s"),
            "t_harvest_wait_s": st.get("t_harvest_wait_s"),
            "rows_scheduled": st.get("rows_scheduled"),
            "tokens_emitted": st.get("tokens_emitted"),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mqa_capacity_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)

    # merge a summary row into results.json (same metric-keyed schema as
    # run_all.py) so the capacity claim is recorded beside the BASELINE
    # configs
    mha = results[0]
    best = max(results[1:], key=lambda r: r["img_per_s"])
    row = {
        "metric": ("mqa_capacity_continuous" if args.mqa_kv == 1
                   else f"gqa{args.mqa_kv}_capacity_continuous"),
        "value": best["img_per_s"],
        "unit": "images/sec",
        "note": (f"trained {arm2} (nhead_kv={args.mqa_kv}) continuous engine at "
                 f"{best['slots']} slots vs trained MHA at "
                 f"{mha['slots']} slots (equal self-KV cache HBM: "
                 f"{best['self_kv_mb']} MB); real-eos stroke renders, "
                 f"{args.requests} requests; full arms in "
                 "benchmarks/mqa_capacity_results.json"),
        "vs_mha_equal_self_kv": round(best["img_per_s"]
                                      / mha["img_per_s"], 2),
        "mha_img_per_s": mha["img_per_s"],
        "arms": results,
    }
    res_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results.json")
    try:
        with open(res_path) as f:
            merged = {r["metric"]: r for r in json.load(f)}
    except FileNotFoundError:
        merged = {}
    merged[row["metric"]] = row
    with open(res_path, "w") as f:
        json.dump(list(merged.values()), f, indent=2)


if __name__ == "__main__":
    main()
