#!/usr/bin/env bash
# Serve TensorBoard over runs/ (reference sh/view_summaries.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec tensorboard --logdir runs "$@"
