#!/usr/bin/env bash
# End-to-end AVSR on synthetic data: train (valid beam WER, best-by-WER
# checkpointing) -> clean eval -> one-point SNR sweep.
# Reference analogs: scripts/train.sh, scripts/eval.sh, scripts/eval_snr.sh.
set -euo pipefail
CORPUS=${1:-/tmp/mmvc_corpus}
OUT=${2:-/tmp/mmvc_tiny_avsr}
cd "$(dirname "$0")/../.."

[ -f "$CORPUS/train.tsv" ] || python examples/make_synthetic_corpus.py "$CORPUS"

python -m multimodalvc_tpu.cli.train --config examples/tiny_avsr/config.yaml \
  dataset.data="$CORPUS" task.noise_wav="$CORPUS/babble.wav" \
  checkpoint.save_dir="$OUT/ckpt"

# clean eval: writes hypo-*.json + wer.* like the reference's src/eval.py
python -m multimodalvc_tpu.cli.eval --config examples/tiny_avsr/config.yaml \
  dataset.data="$CORPUS" checkpoint.save_dir="$OUT/ckpt" \
  --results "$OUT/results"

# babble noise at a fixed SNR (reference: eval_snr.sh override.noise_snr)
python -m multimodalvc_tpu.cli.eval --config examples/tiny_avsr/config.yaml \
  dataset.data="$CORPUS" checkpoint.save_dir="$OUT/ckpt" \
  task.noise_wav="$CORPUS/babble.wav" task.noise_prob=1.0 task.noise_snr=0 \
  --results "$OUT/results_snr0"

grep -h "" "$OUT"/results*/wer.* || true
