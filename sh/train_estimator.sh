#!/usr/bin/env bash
# Launch weather-estimator training (reference sh/train_estimator.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m weather_unet_tpu.cli.train_estimator "$@"
