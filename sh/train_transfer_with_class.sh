#!/usr/bin/env bash
# Launch class-conditioned transfer training
# (reference sh/train_transfer_with_class.sh equivalent).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m weather_unet_tpu.cli.train_transfer_cls "$@"
