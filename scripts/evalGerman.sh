#!/usr/bin/env bash
# German-manifest WER evaluation (reference: scripts/evalGerman.sh — the
# 1759h checkpoint decoded over manifest/germanManifest with beam 5).
set -euo pipefail
DATA=${1:?usage: evalGerman.sh <german_manifest_dir> [overrides...]}
shift
python -m multimodalvc_tpu.cli.eval --config conf/s2s_decode.yaml \
  --results results/german_eval \
  dataset.data="$DATA" generation.beam=5 "$@"
