#!/bin/bash
# Round-4 chip chain: sequential TPU jobs (never concurrent — tunnel
# timing). Run from repo root. Each writes its own results file.
set -x
cd "$(dirname "$0")/.."

# 1) HTTP closed-loop A/B/A: harvest thread pool (VERDICT r3 #1)
#    worst-case flagship artifact (eos-suppressed 150-step decodes)
timeout 2400 python benchmarks/loadtest.py --worst --mode continuous \
  --use-fused --clients 64 --requests 256 --harvest-threads 1 \
  > benchmarks/loadtest_r4_ht1_a.json
timeout 1800 python benchmarks/loadtest.py --worst --mode continuous \
  --use-fused --clients 64 --requests 256 \
  > benchmarks/loadtest_r4_htD_b.json
timeout 1800 python benchmarks/loadtest.py --worst --mode continuous \
  --use-fused --clients 64 --requests 256 --harvest-threads 1 \
  > benchmarks/loadtest_r4_ht1_a2.json
timeout 1800 python benchmarks/loadtest.py --worst --mode continuous \
  --use-fused --clients 64 --requests 256 \
  > benchmarks/loadtest_r4_htD_b2.json

# 2) beam step attribution (VERDICT r3 #3)
timeout 1800 python benchmarks/probe_beam_split.py --t-active 40
timeout 1200 python benchmarks/probe_beam_split.py --t-active 0

# 3) encoder stage-1 tile-pad A/B (VERDICT r3 #4)
timeout 2400 python benchmarks/ab_encoder_pad.py --batch 32
