#!/usr/bin/env bash
# Launch semi-supervised estimator-conditioned transfer training
# (reference sh/train_transfer.sh equivalent; flags pass through).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m weather_unet_tpu.cli.train_transfer_est "$@"
