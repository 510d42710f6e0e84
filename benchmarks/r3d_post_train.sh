#!/bin/bash
# Round-3d post-training pipeline (runs/stream_swin_stroke_r3d): held-out
# confidence-calibration evidence on a trained stroke-corpus model, plus a
# refreshed serving artifact that ships its calibrator.
set -u
cd "$(dirname "$0")/.."
RUN=runs/stream_swin_stroke_r3d
TAG=stream_swin_stroke_r3d
OVR='{"dropout": 0.0, "memory_norm": true, "swin": {"stochastic_depth": 0.0}}'
step() { echo "=== $1 at $(date -u +%H:%M:%S)"; }

step "train log + curves -> evidence"
cp /tmp/stroke_r3d_train.out "$RUN/train.log" 2>/dev/null || true
python benchmarks/collect_training_evidence.py "$RUN" --tag "$TAG"

step "held-out corpora: test (seed 777, same split as r3 evals) + calib (seed 778)"
timeout 1800 python -m handwritten_math_ocr_api_tpu make-corpus \
  --data-root data_eval_stroke --train 4 --val 4 --test 2000 --seed 777 \
  --renderer stroke
timeout 1800 python -m handwritten_math_ocr_api_tpu make-corpus \
  --data-root data_calib_stroke --train 4 --val 4 --test 2000 --seed 778 \
  --renderer stroke

step "evaluate greedy (fused) on both splits — records per-sample confidence"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_stroke --checkpoint-dir "$RUN" \
  --model-overrides "$OVR" --use-fused --out-dir results/$TAG
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_calib_stroke --checkpoint-dir "$RUN" \
  --model-overrides "$OVR" --use-fused --out-dir results/${TAG}_calib

step "collect eval artifacts"
python benchmarks/collect_training_evidence.py "$RUN" \
  --tag "$TAG" --eval-dir results/$TAG

step "held-out calibration evidence (fit on seed-778 split, report on 777)"
python benchmarks/calibration_evidence.py \
  --fit-csv results/${TAG}_calib/test_results.csv \
  --test-csv results/$TAG/test_results.csv \
  --out benchmarks/calibration_results.json \
  --save-calibrator /tmp/calibration_r3d.json \
  | tee docs/evidence/${TAG}_calibration.txt

step "reliability diagram -> evidence"
python benchmarks/plot_reliability.py \
  --results benchmarks/calibration_results.json \
  --out docs/evidence/${TAG}_reliability.png

step "export serving artifact with calibrator -> serving_model_r3d"
python -m handwritten_math_ocr_api_tpu export \
  --checkpoint-dir "$RUN" --model-overrides "$OVR" serving_model_r3d
cp /tmp/calibration_r3d.json serving_model_r3d/calibration.json

step "post-train pipeline done"
