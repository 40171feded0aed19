#!/usr/bin/env bash
# NoLLM speech head fine-tuning (reference: scripts/fineTuneSpeechNoLLM.sh).
set -euo pipefail
DATA=${1:?usage: fineTuneSpeechNoLLM.sh <manifest_dir>}
python -m multimodalvc_tpu.cli.train --config conf/mms-speech-nollm.yaml \
  dataset.data="$DATA" "$@"
