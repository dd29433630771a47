#!/usr/bin/env bash
# Serving deployment pipeline (reference runtime/triton_trtllm/run.sh stages):
#   1. build AOT engine artifacts (trtllm-build analog; set ARTIFACTS=)
#      or warm the live-jit compilation cache
#   2. start the HTTP server        3. smoke-test a request
#   4. offline RTF benchmark
# Usage: scripts/run_serving.sh <ckpt_file> <vocos_ckpt> <ref_wav> "<ref text>"
# Default: AOT --warm bundle under artifacts/ (zero-compile server loads,
# tested by tests/test_aot.py::test_warm_bundle_loads_without_compile).
#   ARTIFACTS=other/dir scripts/run_serving.sh ...   # custom bundle location
#   ARTIFACTS= scripts/run_serving.sh ...            # live-jit + cache warmup

set -euo pipefail
CKPT=${1:?ckpt file}
VOC=${2:?vocos ckpt}
REF=${3:?ref wav}
REF_TEXT=${4:?ref text}
PORT=${PORT:-8000}
ARTIFACTS=${ARTIFACTS-artifacts}

if [[ -n "$ARTIFACTS" ]]; then
  echo "[1/4] building AOT engine artifacts -> $ARTIFACTS"
  # --warm AOT-compiles on this host's topology and packages the XLA cache
  # entries with the bundle: cold servers load without compiling
  f5-tts_build-engine --out "$ARTIFACTS" --model F5TTS_v1_Base --nfe 16 \
    --ckpt "$CKPT" --vocoder "$VOC" --batches 1 2 --buckets 1024 --ref-buckets 512 \
    --warm
  AOT_FLAG=(--artifacts "$ARTIFACTS")
else
  echo "[1/4] warming compilation cache"
  python scripts/warmup_cache.py --model F5TTS_v1_Base --nfe 16 32 --buckets 512 1024 2048
  AOT_FLAG=()
fi

echo "[2/4] starting HTTP server on :$PORT"
f5-tts_http-server --ckpt_file "$CKPT" --vocoder_local_path "$VOC" \
  --ref_audio "$REF" --ref_text "$REF_TEXT" --port "$PORT" ${AOT_FLAG[@]+"${AOT_FLAG[@]}"} &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT
sleep 5

echo "[3/4] smoke test"
python - <<PY
from f5_tts_tpu.infer.http_server import request_tts
wav, sr = request_tts("Hello from the serving pipeline.", port=$PORT)
print(f"got {len(wav)/sr:.2f}s of audio")
PY

echo "[4/4] offline benchmark"
python -m f5_tts_tpu.runtime.benchmark --backend-type flash --nfe 16 \
  --ckpt_file "$CKPT" --vocoder_local_path "$VOC"
