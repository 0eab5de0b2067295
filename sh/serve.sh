#!/usr/bin/env bash
# Launch the HTTP inference server (micro-batching, uint8 device wire).
# Example: sh/serve.sh --cp_path cp/transfer/cUNet/latest.pt --port 8000 --bf16
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m weather_unet_tpu.cli.serve "$@"
