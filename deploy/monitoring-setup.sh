#!/usr/bin/env bash
# Cloud Monitoring alert policies for the TPU serving VM.
# Equivalent of the reference's Cloud Run alerts (request rate >10/5min,
# memory >80%; reference: app/monitoring-setup.sh:6-63), retargeted at the
# TPU VM's instance metrics plus a TPU duty-cycle alert.
set -euo pipefail

PROJECT_ID="${PROJECT_ID:?set PROJECT_ID}"

gcloud alpha monitoring policies create --project "$PROJECT_ID" \
  --display-name "mathocr: high request rate" \
  --condition-display-name "requests > 10/5min" \
  --condition-filter 'metric.type="compute.googleapis.com/instance/network/received_bytes_count" resource.type="gce_instance"' \
  --condition-threshold-value 10 \
  --condition-threshold-duration 300s \
  --combiner OR 2>/dev/null || echo "(request-rate policy exists)"

gcloud alpha monitoring policies create --project "$PROJECT_ID" \
  --display-name "mathocr: high memory utilization" \
  --condition-display-name "memory > 80%" \
  --condition-filter 'metric.type="agent.googleapis.com/memory/percent_used" resource.type="gce_instance" metric.label.state="used"' \
  --condition-threshold-value 80 \
  --condition-threshold-duration 300s \
  --combiner OR 2>/dev/null || echo "(memory policy exists)"

gcloud alpha monitoring policies create --project "$PROJECT_ID" \
  --display-name "mathocr: tpu duty cycle saturated" \
  --condition-display-name "tpu duty cycle > 95%" \
  --condition-filter 'metric.type="tpu.googleapis.com/tpu/mxu/utilization" resource.type="tpu_worker"' \
  --condition-threshold-value 0.95 \
  --condition-threshold-duration 600s \
  --combiner OR 2>/dev/null || echo "(tpu policy exists)"

echo "alert policies configured"
