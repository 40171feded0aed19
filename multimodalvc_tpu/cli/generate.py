"""Speech generation CLI: mel -> waveform via the vocoder, or AV clip ->
waveform via the NoLLM/E2E models.

Reference analogs: custom_hifigan/generate.py (batch vocoding),
scripts/quickInference.py and src/inference_speech*.py.
"""
from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

logger = logging.getLogger(__name__)


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="mode", required=True)

    voc = sub.add_parser("vocode", help="mel (.npy [T,128]) -> wav")
    voc.add_argument("--mel", required=True)
    voc.add_argument("--checkpoint", help="reference .pt or orbax dir")
    voc.add_argument("--out", default="out.wav")
    voc.add_argument("--ema", action="store_true", default=True)

    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    if args.mode == "vocode":
        import jax.numpy as jnp

        from ..data.audio import write_wav
        from ..models.vocoder import VocoderConfig, VocoderModel

        model = VocoderModel(VocoderConfig())
        mel = np.load(args.mel).astype(np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        if args.checkpoint and args.checkpoint.endswith((".pt", ".pth")):
            variables = model.import_torch_checkpoint(args.checkpoint, use_ema=args.ema)
        else:
            logger.warning("no checkpoint — random vocoder weights")
            variables = {"params": model.init_state(jax.random.PRNGKey(0)).gen_params}
        wav = np.asarray(model.generate(variables["params"], jnp.asarray(mel)))[0]
        write_wav(args.out, wav)
        logger.info("wrote %s (%.2f s)", args.out, len(wav) / 16000)


if __name__ == "__main__":
    main()
