#!/usr/bin/env bash
# Single-clip AVSR demo (reference: scripts/demo.sh -> src/demo.py).
set -euo pipefail
VIDEO=${1:?usage: demo.sh <video> <audio> [overrides...]}
AUDIO=${2:?usage: demo.sh <video> <audio> [overrides...]}
shift 2
python -m multimodalvc_tpu.cli.demo --video "$VIDEO" --audio "$AUDIO" "$@"
