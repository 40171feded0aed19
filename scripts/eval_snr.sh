#!/usr/bin/env bash
# Noisy WER sweep at fixed SNRs (reference: scripts/eval_snr.sh —
# noise_prob=1, babble noise mixed at each SNR level).
set -euo pipefail
DATA=${1:?usage: eval_snr.sh <manifest_dir> <noise_wav>}
NOISE=${2:?need noise wav}
for SNR in -5 0 5 10 15 20; do
  echo "=== SNR ${SNR} dB ==="
  python -m multimodalvc_tpu.cli.eval --config conf/s2s_decode.yaml \
    dataset.data="$DATA" task.noise_wav="$NOISE" task.noise_prob=1.0 \
    task.noise_snr="$SNR" --results "results/snr_${SNR}"
done
