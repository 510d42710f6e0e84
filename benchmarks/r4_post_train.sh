#!/bin/bash
# Round-4 post-training pipeline for the HARD-corpus 40-epoch run
# (runs/stream_swin_hard): evidence, evals (greedy/int8/beam5), serving
# artifact, trained-artifact HTTP loadtest, beam pure-decode A/B with the
# Pallas reorder kernel. Sequential TPU jobs only.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hard_train.out}
RUN=runs/stream_swin_hard
TAG=stream_swin_hard
OVR='{"dropout": 0.0, "memory_norm": true, "swin": {"stochastic_depth": 0.0}}'
step() { echo "=== $1 at $(date -u +%H:%M:%S)"; }

step "train log + curves -> evidence"
cp "$LOG" "$RUN/train.log"
python benchmarks/collect_training_evidence.py "$RUN" --tag "$TAG"

step "held-out HARD stroke eval corpus (2000, seed 777)"
timeout 2400 python -m handwritten_math_ocr_api_tpu make-corpus \
  --data-root data_eval_hard --train 4 --val 4 --test 2000 --seed 777 \
  --renderer stroke --hard

step "evaluate: greedy (fused kernel)"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_hard --checkpoint-dir "$RUN" \
  --model-overrides "$OVR" --use-fused --out-dir results/$TAG

step "evaluate: greedy int8-in-kernel"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_hard --checkpoint-dir "$RUN" \
  --model-overrides "$OVR" --use-fused --quantize \
  --out-dir results/${TAG}_int8

step "evaluate: beam-5 (fused ragged beam + Pallas reorder)"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_hard --checkpoint-dir "$RUN" \
  --model-overrides "$OVR" --beam-size 5 --use-fused \
  --out-dir results/${TAG}_beam5

step "collect eval artifacts"
python benchmarks/collect_training_evidence.py "$RUN" \
  --tag "$TAG" || true
for sub in "" _int8 _beam5; do
  for f in summary.txt test_results.csv; do
    src=results/${TAG}${sub}/$f
    [ -f "$src" ] && cp "$src" docs/evidence/${TAG}${sub}_eval_${f/./_}.${f##*.} 2>/dev/null
  done
done

step "export serving artifact"
timeout 1200 python -m handwritten_math_ocr_api_tpu export \
  --checkpoint-dir "$RUN" serving_model_r4 \
  --model-overrides "$OVR"

step "trained-artifact HTTP loadtest (continuous, fused)"
timeout 1800 python benchmarks/loadtest.py --model-dir serving_model_r4 \
  --mode continuous --use-fused --clients 64 --requests 256 \
  > benchmarks/loadtest_continuous_fused_http_r4.json
cat benchmarks/loadtest_continuous_fused_http_r4.json

step "beam probe with Pallas reorder arm (full T + bucket 40)"
timeout 1800 python benchmarks/probe_beam_split.py --t-active 0
timeout 1200 python benchmarks/probe_beam_split.py --t-active 40

step "done"
