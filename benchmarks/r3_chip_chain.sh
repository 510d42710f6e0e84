#!/bin/bash
# Round-3 on-chip measurement chain. Run (or let the TPU watcher run it)
# as soon as the tunnel is healthy; each step is independently timed out
# so one hang cannot starve the rest. Artifacts land in benchmarks/ and
# docs/evidence/; the final step launches the stroke-corpus training run
# (the long pole) in the foreground.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks
mkdir -p docs/evidence
log() { echo "=== $1 at $(date -u +%H:%M:%S)"; }

log "1/7 continuous-fused HTTP loadtest (63 slots)"
timeout 2400 python benchmarks/loadtest.py --model-dir serving_model_r2 \
  --mode continuous --use-fused --slots 63 --pipeline-depth 4 \
  --clients 64 --requests 256 | tee $OUT/loadtest_continuous_fused_http.json

log "1b/7 BASELINE config 5 (worst-case 150-step decodes, merges results.json)"
timeout 2400 python benchmarks/run_all.py --configs 5

log "2/7 warm single-request latency demo (fused+int8)"
timeout 1800 python benchmarks/warm_latency_demo.py \
  --model-dir serving_model_r2 --use-fused --quantize --requests 20 \
  | tee docs/evidence/serving_demo_r3_warm_latency.txt

log "3/7 encoder stage attribution (+ fused-block trunk)"
timeout 1800 python benchmarks/probe_encoder_stages.py --batch 10 \
  --iters 30 | tee $OUT/probe_encoder_stages.json

log "4/7 encoder roofline"
timeout 1800 python benchmarks/roofline_encoder.py \
  | tee $OUT/roofline_encoder.json

log "5/7 beam ancestry A/B"
timeout 1800 python benchmarks/ab_beam.py --batch 64 --beam 5 --iters 6 \
  | tee $OUT/ab_beam_results.json

log "6/7 MQA capacity"
timeout 1800 python benchmarks/mqa_capacity.py \
  | tee $OUT/mqa_capacity_results.json

log "7/7 stroke-corpus flagship training (long; ctrl-c safe, resumable)"
timeout 14400 python -m handwritten_math_ocr_api_tpu train \
  --checkpoint-dir runs/stream_swin_stroke --epochs 40 \
  --warmup-steps 1000 --early-stop-patience 20 \
  --synthetic-stream 25000 --stream-renderer stroke \
  --model-overrides '{"dropout": 0.0, "memory_norm": true, "swin": {"stochastic_depth": 0.0}}'
log "chain done"
