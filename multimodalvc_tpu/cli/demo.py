"""Single-file AVSR demo: one video + one wav -> transcript.

Reference: src/demo.py:27-159 — loads a checkpoint, preprocesses one clip
(center-crop video, whisper features), beam-search decodes, prints text.
"""
from __future__ import annotations

import argparse
import logging

import jax
import numpy as np

from ..config import TrainRootConfig, apply_overrides, from_dict, load_yaml, merge
from ..data.audio import read_wav, whisper_features_np
from ..data.tokenizer import INSTRUCTION_TEXT, load_tokenizer
from ..data.video import load_video_frames, transform_video
from ..runtime.checkpoint import CheckpointManager
from .train import build_task

logger = logging.getLogger(__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="conf/s2s_decode.yaml")
    parser.add_argument("--video", required=True)
    parser.add_argument("--audio", required=True)
    parser.add_argument("--beams", type=int, default=5)
    parser.add_argument("--max-len", type=int, default=100)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    tree = {}
    if args.config:
        merge(tree, load_yaml(args.config))
    apply_overrides(tree, args.overrides)
    # the demo needs no manifest; satisfy the dataset field
    tree.setdefault("dataset", {})["data"] = tree.get("dataset", {}).get("data", "/tmp")
    cfg = from_dict(TrainRootConfig, tree)
    task = build_task(cfg)
    mcfg = task.model_cfg

    tok = load_tokenizer(cfg.task.get("llm_path"))
    mcfg.eos_token_id = tok.eos_token_id
    mcfg.pad_token_id = tok.pad_token_id

    frames = load_video_frames(args.video)
    video = transform_video(frames)[None]  # [1, T, 88, 88, 1]
    wav = read_wav(args.audio)
    feats = whisper_features_np(wav)[None][:, :, : 2 * mcfg.whisper.max_frames]
    import jax.numpy as jnp

    batch = {
        "video": jnp.asarray(video),
        "video_lengths": jnp.asarray([video.shape[1]], jnp.int32),
        "audio_feats": jnp.asarray(feats),
        "audio_lengths": jnp.asarray([len(wav)], jnp.int32),
        "instruction": jnp.asarray(np.asarray(tok.encode(INSTRUCTION_TEXT))[None]),
    }

    variables = task.system.init(
        jax.random.PRNGKey(0),
        {**batch, "labels": jnp.zeros((1, 4), jnp.int32), "label_lengths": jnp.asarray([4], jnp.int32)},
    )
    ckpt = CheckpointManager(cfg.checkpoint.save_dir)
    restored = ckpt.restore(
        {"params": variables["params"], "collections": {k: v for k, v in variables.items() if k != "params"}},
        cfg.checkpoint.restore_file,
    )
    if restored is not None:
        variables = {"params": restored["params"], **restored["collections"]}
    else:
        logger.warning("no checkpoint restored — output will be noise")

    seqs, scores = task.system.generate(
        variables, batch, num_beams=args.beams, max_new_tokens=args.max_len
    )
    best = np.asarray(seqs[0, 0])
    toks = []
    for t in best.tolist():
        if t == mcfg.eos_token_id:
            break
        toks.append(t)
    print("TRANSCRIPT:", tok.decode(toks))


if __name__ == "__main__":
    main()
