#!/usr/bin/env bash
# LLM speech head fine-tuning (reference: scripts/fineTuneSpeech.sh).
set -euo pipefail
DATA=${1:?usage: fineTuneSpeech.sh <manifest_dir>}
python -m multimodalvc_tpu.cli.train --config conf/mms-llama-speech.yaml \
  dataset.data="$DATA" "$@"
