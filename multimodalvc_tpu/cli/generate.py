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
    from ._platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="mode", required=True)

    voc = sub.add_parser("vocode", help="mel (.npy [T,128]) -> wav")
    voc.add_argument("--mel", required=True)
    voc.add_argument("--checkpoint", help="reference .pt or orbax dir")
    voc.add_argument("--out", default="out.wav")
    voc.add_argument("--ema", action="store_true", default=True)

    syn = sub.add_parser(
        "synthesize", help="AV clip -> waveform via the NoLLM speech model + vocoder"
    )
    syn.add_argument("--video", required=True, help=".npy [T, H, W]")
    syn.add_argument("--audio", required=True, help="16 kHz wav")
    syn.add_argument("--checkpoint", help="orbax dir with the speech-model state")
    syn.add_argument("--vocoder-checkpoint", help="vocoder .pt / orbax dir")
    syn.add_argument("--preset", default="tiny")
    syn.add_argument("--out", default="synth.wav")

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
        elif args.checkpoint:
            # orbax dir written by the vocoder training loop
            # (cli/train.py:_vocoder_loop saves {gen_params, ema_params})
            from ..runtime.checkpoint import CheckpointManager

            tmpl = model.init_state(jax.random.PRNGKey(0)).gen_params
            restored = CheckpointManager(os.path.dirname(args.checkpoint) or ".").restore(
                {"gen_params": tmpl, "ema_params": tmpl},
                name=os.path.basename(args.checkpoint.rstrip("/")),
            )
            if restored is None:
                raise SystemExit(f"no restorable checkpoint at {args.checkpoint}")
            variables = {
                "params": restored["ema_params" if args.ema else "gen_params"]
            }
            logger.info("restored vocoder from %s", args.checkpoint)
        else:
            logger.warning("no checkpoint — random vocoder weights")
            variables = {"params": model.init_state(jax.random.PRNGKey(0)).gen_params}
        wav = np.asarray(model.generate(variables["params"], jnp.asarray(mel)))[0]
        write_wav(args.out, wav)
        logger.info("wrote %s (%.2f s)", args.out, len(wav) / 16000)

    elif args.mode == "synthesize":
        _synthesize(args)


def _synthesize(args):
    """Single-clip speech synthesis (reference: src/inference_speech*.py +
    scripts/quickInference.py): video + audio -> NoLLM mel head -> vocoder."""
    import jax.numpy as jnp

    from ..data.audio import read_wav, whisper_features_np, write_wav
    from ..data.video import transform_video
    from ..models.speech import SpeechConfig, SpeechNoLLMModel
    from ..models.vocoder import VocoderConfig, VocoderModel
    from ..runtime.checkpoint import CheckpointManager

    cfg = getattr(SpeechConfig, args.preset)() if args.preset else SpeechConfig()
    model = SpeechNoLLMModel(cfg)
    crop = 24 if args.preset == "tiny" else 88
    frames = transform_video(np.load(args.video), crop_size=crop, train=False)
    wav_in = read_wav(args.audio)
    t_v = min(frames.shape[0], cfg.max_video_frames)
    batch = {
        "video": jnp.asarray(frames[None, :t_v]),
        "video_lengths": jnp.asarray([t_v], jnp.int32),
        "audio_feats": jnp.asarray(whisper_features_np(wav_in)[None, :, : 2 * cfg.whisper.max_frames]),
        "audio_lengths": jnp.asarray([len(wav_in)], jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    if args.checkpoint:
        mgr = CheckpointManager(args.checkpoint)
        restored = mgr.restore(
            {"params": variables["params"],
             "collections": {k: v for k, v in variables.items() if k != "params"}},
        )
        if restored is not None:
            variables = {"params": restored["params"], **restored["collections"]}
            logger.info("restored speech model from %s", args.checkpoint)
    else:
        logger.warning("no speech checkpoint — random weights")
    out = model.apply(variables, batch, train=False)
    mel = out["melspec"][:, : int(out["mel_lengths"][0])]

    voc = VocoderModel(VocoderConfig())
    if args.vocoder_checkpoint and args.vocoder_checkpoint.endswith((".pt", ".pth")):
        gen_params = voc.import_torch_checkpoint(args.vocoder_checkpoint)
    else:
        logger.warning("no vocoder checkpoint — random weights")
        gen_params = voc.init_state(jax.random.PRNGKey(1)).gen_params
    wav = np.asarray(voc.generate(gen_params, mel))[0]
    write_wav(args.out, wav)
    logger.info("wrote %s (%.2f s)", args.out, len(wav) / 16000)


if __name__ == "__main__":
    main()
