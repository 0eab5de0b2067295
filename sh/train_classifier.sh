#!/usr/bin/env bash
# Launch weather-classifier training (reference sh/train_classifier.sh).
# No CUDA_VISIBLE_DEVICES pinning needed: device selection is JAX's.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m weather_unet_tpu.cli.train_classifier "$@"
