#!/usr/bin/env bash
# Clean WER evaluation (reference: scripts/eval.sh — beam 5).
set -euo pipefail
DATA=${1:?usage: eval.sh <manifest_dir>}
python -m multimodalvc_tpu.cli.eval --config conf/s2s_decode.yaml \
  dataset.data="$DATA" "$@"
