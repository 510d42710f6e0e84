#!/bin/bash
# Round-3 post-training pipeline: evidence, eval, serving artifact, MQA run.
# Run after runs/stream_swin_stroke finishes (train log in /tmp/stroke_train.out
# or pass a different log path as $1).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/stroke_train.out}
RUN=runs/stream_swin_stroke
OVR='{"dropout": 0.0, "memory_norm": true, "swin": {"stochastic_depth": 0.0}}'
step() { echo "=== $1 at $(date -u +%H:%M:%S)"; }

step "train log + curves -> evidence"
cp "$LOG" "$RUN/train.log"
python benchmarks/collect_training_evidence.py "$RUN" --tag stream_swin_stroke

step "held-out stroke eval corpus (2000, seed 777)"
timeout 1800 python -m handwritten_math_ocr_api_tpu make-corpus \
  --data-root data_eval_stroke --train 4 --val 4 --test 2000 --seed 777 \
  --renderer stroke

step "evaluate: greedy (fused kernel)"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_stroke --checkpoint-dir "$RUN" \
  --model-overrides "$OVR" --use-fused --out-dir results/stream_swin_stroke

step "evaluate: greedy int8-in-kernel"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_stroke --checkpoint-dir "$RUN" \
  --model-overrides "$OVR" --use-fused --quantize \
  --out-dir results/stream_swin_stroke_int8

step "evaluate: beam-5"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_stroke --checkpoint-dir "$RUN" \
  --model-overrides "$OVR" --beam-size 5 \
  --out-dir results/stream_swin_stroke_beam5

step "collect eval artifacts"
python benchmarks/collect_training_evidence.py "$RUN" \
  --tag stream_swin_stroke --eval-dir results/stream_swin_stroke
python benchmarks/collect_training_evidence.py "$RUN" \
  --tag stream_swin_stroke_int8 --eval-dir results/stream_swin_stroke_int8
python benchmarks/collect_training_evidence.py "$RUN" \
  --tag stream_swin_stroke_beam5 --eval-dir results/stream_swin_stroke_beam5

step "export serving artifact -> serving_model_r3"
python - <<'EOF'
import jax
from handwritten_math_ocr_api_tpu.core.config import (
    Config, ModelConfig, SwinConfig)
from handwritten_math_ocr_api_tpu.core.tokenizer import load_vocab
from handwritten_math_ocr_api_tpu.train.checkpoint import (
    load_checkpoint, save_params_for_serving)
from handwritten_math_ocr_api_tpu.train.step import create_train_state

vocab, _ = load_vocab("runs/stream_swin_stroke/vocab.json")
cfg = ModelConfig(vocab_size=len(vocab), dropout=0.0, memory_norm=True,
                  swin=SwinConfig(stochastic_depth=0.0))
state, _ = create_train_state(jax.random.PRNGKey(0), cfg, Config().train)
state, _ = load_checkpoint("runs/stream_swin_stroke", "best_model", state,
                           params_only=True)
out = save_params_for_serving("serving_model_r3", state.params, vocab, cfg,
                              model_state=state.model_state)
print("serving artifact ->", out)
EOF

step "continuous-fused HTTP loadtest (63 slots, trained r3 artifact)"
timeout 2400 python benchmarks/loadtest.py --model-dir serving_model_r3 \
  --mode continuous --use-fused --slots 63 --pipeline-depth 4 \
  --clients 64 --requests 256 \
  | tee benchmarks/loadtest_continuous_fused_http.json

step "BASELINE config 5 (worst-case 150-step decodes, merges results.json)"
timeout 2400 python benchmarks/run_all.py --configs 5

step "warm single-request latency demo (fused+int8, trained r3 artifact)"
timeout 1800 python benchmarks/warm_latency_demo.py \
  --model-dir serving_model_r3 --use-fused --quantize --requests 20 \
  | tee docs/evidence/serving_demo_r3_warm_latency.txt

step "MQA stroke run (20 epochs, nhead_kv=1)"
timeout 7200 python -m handwritten_math_ocr_api_tpu train \
  --checkpoint-dir runs/stream_swin_stroke_mqa --epochs 20 \
  --warmup-steps 1000 --early-stop-patience 20 \
  --synthetic-stream 25000 --stream-renderer stroke \
  --model-overrides '{"dropout": 0.0, "memory_norm": true, "nhead_kv": 1, "swin": {"stochastic_depth": 0.0}}' \
  2>&1 | tee runs/stream_swin_stroke_mqa_train.log

step "MQA stroke eval (greedy fused)"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_stroke --checkpoint-dir runs/stream_swin_stroke_mqa \
  --model-overrides '{"dropout": 0.0, "memory_norm": true, "nhead_kv": 1, "swin": {"stochastic_depth": 0.0}}' \
  --use-fused --out-dir results/stream_swin_stroke_mqa

step "MQA capacity (stroke-trained MHA vs MQA, equal cache HBM)"
timeout 1800 python benchmarks/mqa_capacity.py \
  --mha-run runs/stream_swin_stroke --mqa-run runs/stream_swin_stroke_mqa \
  --renderer stroke --overrides "$OVR" \
  | tee benchmarks/mqa_capacity_results.json

step "post-train pipeline done"
