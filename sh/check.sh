#!/usr/bin/env bash
# Run the GIF demo (reference sh/check.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m weather_unet_tpu.cli.demo "$@"
