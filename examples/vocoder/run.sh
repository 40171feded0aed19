#!/usr/bin/env bash
# HiFi-GAN vocoder: offline mel targets -> short GAN training run -> vocode
# one mel back to a waveform.
# Reference analogs: src/generateLogMel-Spectrograms.py,
# scripts/trainGermanVocoder.py, custom_hifigan/generate.py.
set -euo pipefail
CORPUS=${1:-/tmp/mmvc_corpus}
OUT=${2:-/tmp/mmvc_vocoder}
cd "$(dirname "$0")/../.."

[ -f "$CORPUS/train.tsv" ] || python examples/make_synthetic_corpus.py "$CORPUS"

# 128-band 100 Hz log-mels next to each wav (*_mel_100hz_128bands.npy)
python -m multimodalvc_tpu.cli.manifest_tools generate-mels \
  --tsv "$CORPUS/train.tsv" --workers 2

# short training run (full-size generator; production preset just raises
# max_update/batch — conf/hifigan-vocoder.yaml)
python -m multimodalvc_tpu.cli.train --config conf/hifigan-vocoder.yaml \
  dataset.data="$CORPUS" dataset.batch_size=2 dataset.num_workers=0 \
  optimization.max_update=4 checkpoint.save_dir="$OUT/ckpt" \
  task.segment_length=2560

# vocode the first clip's mel with the trained checkpoint (EMA weights)
MEL=$(ls "$CORPUS"/data/*_mel_100hz_128bands.npy | head -1)
python -m multimodalvc_tpu.cli.generate vocode \
  --mel "$MEL" --checkpoint "$OUT/ckpt/checkpoint_last" --out "$OUT/vocoded.wav"

ls -la "$OUT/vocoded.wav"
