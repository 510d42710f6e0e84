#!/usr/bin/env bash
# Deploy the TPU-native math-OCR API to a GCP Cloud TPU VM (v5e).
#
# The reference deployed to Cloud Run (CPU, 0-10 autoscaled instances,
# reference: app/deploy.sh:26-100). Cloud Run has no TPUs, so the TPU-native
# equivalent provisions a v5litepod-1 TPU VM, installs the framework +
# jax[tpu], pushes the serving artifact, and runs the API under systemd.
# Horizontal scale-out = more TPU VMs behind a managed instance group / LB
# (one chip already replaces ~50-150 CPU instances; see BASELINE).
#
# Usage: PROJECT_ID=my-proj ./deploy.sh [zone] [accelerator-type]
set -euo pipefail

PROJECT_ID="${PROJECT_ID:?set PROJECT_ID}"
ZONE="${1:-us-central1-a}"
ACCEL="${2:-v5litepod-1}"
TPU_NAME="${TPU_NAME:-mathocr-serve}"
RUNTIME_VERSION="${RUNTIME_VERSION:-v2-alpha-tpuv5-lite}"
MODEL_DIR="${MODEL_DIR:-trained-model}"
API_KEY="${MODEL_API_KEY:-}"

echo ">>> enabling APIs"
gcloud services enable tpu.googleapis.com compute.googleapis.com \
    secretmanager.googleapis.com monitoring.googleapis.com \
    --project "$PROJECT_ID"

echo ">>> storing API key in Secret Manager"
if [[ -n "$API_KEY" ]]; then
  printf '%s' "$API_KEY" | gcloud secrets create mathocr-api-key \
      --data-file=- --project "$PROJECT_ID" 2>/dev/null || \
  printf '%s' "$API_KEY" | gcloud secrets versions add mathocr-api-key \
      --data-file=- --project "$PROJECT_ID"
fi

echo ">>> creating TPU VM $TPU_NAME ($ACCEL) in $ZONE"
gcloud compute tpus tpu-vm create "$TPU_NAME" \
    --zone "$ZONE" --accelerator-type "$ACCEL" \
    --version "$RUNTIME_VERSION" --project "$PROJECT_ID" 2>/dev/null || \
    echo "    (already exists)"

echo ">>> pushing code + model artifact"
gcloud compute tpus tpu-vm scp --recurse \
    ../handwritten_math_ocr_api_tpu "$MODEL_DIR" \
    "$TPU_NAME":~/ --zone "$ZONE" --project "$PROJECT_ID"

echo ">>> installing deps + native lib + systemd service"
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" \
    --project "$PROJECT_ID" --command "
set -e
pip install -q 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install -q flax optax orbax-checkpoint aiohttp pydantic numpy \
    opencv-python-headless pillow pandas psutil Levenshtein nltk
python3 -m handwritten_math_ocr_api_tpu.native.build
sudo tee /etc/systemd/system/mathocr.service > /dev/null <<'UNIT'
[Unit]
Description=TPU math-OCR serving API
After=network.target
[Service]
WorkingDirectory=/home/%u
Environment=PORT=8080 MODEL_DIR=/home/%u/trained-model
Environment=RATE_LIMIT_PER_MINUTE=20 RATE_LIMIT_PER_HOUR=200
Environment=RATE_LIMIT_PER_DAY=1000 MAX_CONCURRENT_REQUESTS=10
Environment=SERVING_MAX_REQUESTS=20000
ExecStart=/usr/bin/python3 -m handwritten_math_ocr_api_tpu serve --model-dir /home/%u/trained-model --port 8080
Restart=always
[Install]
WantedBy=multi-user.target
UNIT
sudo systemctl daemon-reload
sudo systemctl enable --now mathocr
"

echo ">>> health probe"
for i in {1..12}; do
  if gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" \
      --project "$PROJECT_ID" \
      --command "curl -fsS http://localhost:8080/health" >/dev/null 2>&1; then
    echo "    healthy"
    exit 0
  fi
  sleep 10
done
echo "    health probe FAILED" >&2
exit 1
