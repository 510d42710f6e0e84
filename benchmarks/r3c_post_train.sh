#!/bin/bash
# Round-3c post-training pipeline for the 80-epoch stroke run
# (runs/stream_swin_stroke80): evidence, evals, serving artifact, demos.
# Run after training finishes (train log in /tmp/stroke80_train.out or $1).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/stroke80_train.out}
RUN=runs/stream_swin_stroke80
TAG=stream_swin_stroke80
OVR='{"dropout": 0.0, "memory_norm": true, "swin": {"stochastic_depth": 0.0}}'
step() { echo "=== $1 at $(date -u +%H:%M:%S)"; }

step "train log + curves -> evidence"
cp "$LOG" "$RUN/train.log"
python benchmarks/collect_training_evidence.py "$RUN" --tag "$TAG"

step "held-out stroke eval corpus (2000, seed 777 — same split as the r3 40-epoch run)"
timeout 1800 python -m handwritten_math_ocr_api_tpu make-corpus \
  --data-root data_eval_stroke --train 4 --val 4 --test 2000 --seed 777 \
  --renderer stroke

step "evaluate: greedy (fused kernel)"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_stroke --checkpoint-dir "$RUN" \
  --model-overrides "$OVR" --use-fused --out-dir results/$TAG

step "evaluate: greedy int8-in-kernel"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_stroke --checkpoint-dir "$RUN" \
  --model-overrides "$OVR" --use-fused --quantize \
  --out-dir results/${TAG}_int8

step "evaluate: beam-5 (fused ragged beam)"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_stroke --checkpoint-dir "$RUN" \
  --model-overrides "$OVR" --beam-size 5 --use-fused \
  --out-dir results/${TAG}_beam5

step "collect eval artifacts"
python benchmarks/collect_training_evidence.py "$RUN" \
  --tag "$TAG" --eval-dir results/$TAG
python benchmarks/collect_training_evidence.py "$RUN" \
  --tag "${TAG}_int8" --eval-dir results/${TAG}_int8
python benchmarks/collect_training_evidence.py "$RUN" \
  --tag "${TAG}_beam5" --eval-dir results/${TAG}_beam5

step "export serving artifact -> serving_model_r3c"
python - <<'EOF'
import jax
from handwritten_math_ocr_api_tpu.core.config import (
    Config, ModelConfig, SwinConfig)
from handwritten_math_ocr_api_tpu.core.tokenizer import load_vocab
from handwritten_math_ocr_api_tpu.train.checkpoint import (
    load_checkpoint, save_params_for_serving)
from handwritten_math_ocr_api_tpu.train.step import create_train_state

vocab, _ = load_vocab("runs/stream_swin_stroke80/vocab.json")
cfg = ModelConfig(vocab_size=len(vocab), dropout=0.0, memory_norm=True,
                  swin=SwinConfig(stochastic_depth=0.0))
state, _ = create_train_state(jax.random.PRNGKey(0), cfg, Config().train)
state, _ = load_checkpoint("runs/stream_swin_stroke80", "best_model", state,
                           params_only=True)
out = save_params_for_serving("serving_model_r3c", state.params, vocab, cfg,
                              model_state=state.model_state)
print("serving artifact ->", out)
EOF

step "warm single-request latency demo (fused+int8, trained artifact)"
timeout 1800 python benchmarks/warm_latency_demo.py \
  --model-dir serving_model_r3c --use-fused --quantize --requests 20 \
  | tee docs/evidence/serving_demo_r3c_warm_latency.txt

step "continuous-fused HTTP loadtest (63 slots, trained artifact)"
timeout 2400 python benchmarks/loadtest.py --model-dir serving_model_r3c \
  --mode continuous --use-fused --slots 63 --pipeline-depth 4 \
  --clients 64 --requests 256 \
  | tee benchmarks/loadtest_continuous_fused_http_r3c.json

step "post-train pipeline done"
