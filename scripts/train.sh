#!/usr/bin/env bash
# AVSR fine-tuning (reference: scripts/train.sh — fairseq-hydra-train with
# mms-llama.yaml, 3 queries/sec, cosine LR).
set -euo pipefail
DATA=${1:?usage: train.sh <manifest_dir> [noise_wav]}
NOISE=${2:-}
python -m multimodalvc_tpu.cli.train --config conf/mms-llama.yaml \
  dataset.data="$DATA" \
  ${NOISE:+task.noise_wav="$NOISE"} \
  "$@"
