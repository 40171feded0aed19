#!/usr/bin/env bash
# HiFi-GAN vocoder pretraining (reference: scripts/trainGermanVocoder.py).
set -euo pipefail
DATA=${1:?usage: trainVocoder.sh <manifest_dir>}
python -m multimodalvc_tpu.cli.train --config conf/hifigan-vocoder.yaml \
  dataset.data="$DATA" "$@"
