"""Constrained-continuous A/B on ENV-bearing formulas (round 5).

VERDICT r4 gap #2 asked for the pushdown environment machinery
(decode/constrain.py:71-126) to be exercised by a TRAINED model on a
corpus that actually contains `\\begin{...}` constructs. This probe runs
the continuous-batching engine over the frozen seed-779 env corpus
twice — unconstrained vs constrained (same fused segment kernel, same
slots) — and reports exact match + structural validity for the FULL
set and for the env-bearing subset.

Usage:
  python benchmarks/ab_constrained_env.py \
      --checkpoint-dir runs/hard_env [--n 512] [--num-slots 48]
Writes benchmarks/ab_constrained_env_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-dir", default="runs/hard_env")
    ap.add_argument("--data-root", default="data_eval_env")
    ap.add_argument("--checkpoint", default="best_model")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--num-slots", type=int, default=48)
    ap.add_argument("--use-ema", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

    import pandas as pd

    from handwritten_math_ocr_api_tpu.core.config import (
        Config,
        ModelConfig,
        SwinConfig,
        TrainConfig,
    )
    from handwritten_math_ocr_api_tpu.core.tokenizer import (
        Tokenizer,
        load_vocab,
    )
    from handwritten_math_ocr_api_tpu.data.preprocess import (
        preprocess_file,
    )
    from handwritten_math_ocr_api_tpu.decode.continuous import (
        ContinuousDecoder,
    )
    from handwritten_math_ocr_api_tpu.eval import metrics as metrics_lib
    from handwritten_math_ocr_api_tpu.eval.latex_check import check_latex
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        load_checkpoint,
    )
    from handwritten_math_ocr_api_tpu.train.step import create_train_state

    vocab, idx2char = load_vocab(
        os.path.join(args.checkpoint_dir, "vocab.json"))
    tok = Tokenizer(vocab, idx2char)
    mc = ModelConfig(vocab_size=len(vocab), dropout=0.0, memory_norm=True,
                     swin=SwinConfig(stochastic_depth=0.0))
    tc = TrainConfig(ema_decay=0.999)
    state, _ = create_train_state(jax.random.PRNGKey(0), mc, tc)
    state, _m = load_checkpoint(args.checkpoint_dir, args.checkpoint,
                                state, params_only=True)
    params = state.eval_params if args.use_ema else state.params

    from handwritten_math_ocr_api_tpu.core.tokenizer import (
        clean_latex_output,
    )

    df = pd.read_csv(os.path.join(args.data_root, "test_labels.csv"))
    df = df.iloc[:args.n]
    img_dir = os.path.join(args.data_root, "test_formulas")
    images = [np.asarray(preprocess_file(
        os.path.join(img_dir, r.image_filename), mc)).reshape(
            mc.img_h, mc.img_w, 1)
        for r in df.itertuples()]
    # the continuous engine returns SERVING-cleaned LaTeX
    # (clean_latex_output: '\\begin { matrix }' -> '\\begin{matrix}',
    # app/src/utils.py:22-27) while labels are space-joined tokens —
    # normalize targets through the same cleanup before comparing
    targets = [clean_latex_output(str(r.latex_label))
               for r in df.itertuples()]
    has_env = [("\\begin" in t) for t in targets]

    def run(constrained: bool):
        eng = ContinuousDecoder(params, state.model_state, mc, tok,
                                num_slots=args.num_slots,
                                segment_steps=16, use_fused=True,
                                constrained=constrained)
        t0 = time.time()
        results = eng.run_all(images)
        dt = time.time() - t0
        preds = [r[0] for r in results]
        rows = []
        for p, t, e in zip(preds, targets, has_env):
            rows.append({
                "exact": p.strip() == t.strip(),
                "cer": (metrics_lib.edit_distance(p, t) / len(t))
                if t else 0.0,
                "valid": check_latex(p)[0],
                "env": e,
            })

        def agg(sel):
            sel = [r for r in rows if sel(r)]
            return {
                "n": len(sel),
                "exact": round(float(np.mean([r["exact"] for r in sel])),
                               4),
                "cer": round(float(np.mean([r["cer"] for r in sel])), 4),
                "valid_latex": round(
                    float(np.mean([r["valid"] for r in sel])), 4),
            }
        return {
            "all": agg(lambda r: True),
            "env_subset": agg(lambda r: r["env"]),
            "non_env": agg(lambda r: not r["env"]),
            "img_per_s": round(len(images) / dt, 1),
        }

    out = {
        "metric": "ab_constrained_env",
        "checkpoint": os.path.join(args.checkpoint_dir, args.checkpoint),
        "corpus": args.data_root,
        "n": len(images),
        "unconstrained": run(False),
        "constrained": run(True),
    }
    print(json.dumps(out, indent=2))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ab_constrained_env_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
