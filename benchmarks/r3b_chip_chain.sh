#!/bin/bash
# Round-3 second chip chain: runs after the MQA 40-epoch resume finishes.
# One job at a time (never two TPU jobs concurrently — tunnel timing).
set -u
cd "$(dirname "$0")/.."
OVR='{"dropout": 0.0, "memory_norm": true, "swin": {"stochastic_depth": 0.0}}'
MQA_OVR='{"dropout": 0.0, "memory_norm": true, "nhead_kv": 1, "swin": {"stochastic_depth": 0.0}}'
step() { echo "=== $1 at $(date -u +%H:%M:%S)"; }

step "MQA stroke eval (greedy fused, 40-epoch best)"
timeout 3600 python -m handwritten_math_ocr_api_tpu evaluate \
  --data-root data_eval_stroke --checkpoint-dir runs/stream_swin_stroke_mqa \
  --model-overrides "$MQA_OVR" \
  --use-fused --out-dir results/stream_swin_stroke_mqa

step "collect MQA evidence"
python benchmarks/collect_training_evidence.py runs/stream_swin_stroke_mqa \
  --tag stream_swin_stroke_mqa --eval-dir results/stream_swin_stroke_mqa

step "MQA capacity (3 arms, saturated)"
timeout 3600 python benchmarks/mqa_capacity.py \
  --mha-run runs/stream_swin_stroke --mqa-run runs/stream_swin_stroke_mqa \
  --renderer stroke --overrides "$OVR" --requests 2048

step "training-step roofline sweep"
timeout 3600 python benchmarks/roofline_train.py --batches 64,128,256,512

step "beam A/B/A incl. fused arm"
timeout 2400 python benchmarks/ab_beam.py

step "refresh BASELINE config 4 (fused beam) -> results.json"
timeout 2400 python benchmarks/run_all.py --configs 4

step "HTTP config-5 depth probe (1/2/3)"
timeout 3600 python benchmarks/probe_depth_http.py --depths 1,2,3 \
  --out benchmarks/probe_depth_http_results.json

step "bench.py sanity"
timeout 1800 python bench.py

step "chain done"
