#!/usr/bin/env bash
# E2E waveform GAN fine-tuning (reference: scripts/fineTuneSpeechNoLLM_E2E.sh).
set -euo pipefail
DATA=${1:?usage: fineTuneSpeechNoLLM_E2E.sh <manifest_dir>}
shift
python -m multimodalvc_tpu.cli.train --config conf/mms-speech-nollm-e2e.yaml \
  dataset.data="$DATA" "$@"
