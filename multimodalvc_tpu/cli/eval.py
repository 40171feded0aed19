"""WER evaluation CLI: batched beam-search decode over a test manifest.

Reference: src/eval.py:51-311 — loads a checkpoint, decodes with beam search
(beam 5), writes hypo-<tag>.json and wer.<tag> with corpus WER; eval_snr.sh
reruns it with noise_prob=1 at fixed SNRs.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import logging
import os
from typing import Dict, List

import jax
import numpy as np

from ..config import apply_overrides, from_dict, load_yaml, merge
from ..config.configs import TrainRootConfig
from ..runtime.checkpoint import CheckpointManager, load_ensemble
from ..runtime.metrics import log_stats
from ..utils.wer import wer
from ..data.dataset import PrefetchLoader
from .train import build_task

logger = logging.getLogger(__name__)


def main(cfg: TrainRootConfig, results_path: str = "results") -> Dict[str, float]:
    logging.basicConfig(level=logging.INFO)
    if cfg.common.profile:
        # reference: --profile around decode (src/eval.py:273-276)
        jax.profiler.start_trace(cfg.common.profile_dir)
    try:
        return _main(cfg, results_path)
    finally:
        if cfg.common.profile:
            jax.profiler.stop_trace()
            logger.info("profiler trace written to %s", cfg.common.profile_dir)


def _main(cfg: TrainRootConfig, results_path: str = "results") -> Dict[str, float]:
    task = build_task(cfg)
    ds = task.load_dataset("test")

    sample_idx = ds.batches(max_tokens=cfg.dataset.max_tokens, batch_size=cfg.dataset.batch_size)[0]
    sample = task.prepare_batch(ds.collate([ds[int(i)] for i in sample_idx]))
    variables = task.init_variables(jax.random.PRNGKey(0), sample)

    ckpt = CheckpointManager(cfg.checkpoint.save_dir)
    template = {
        "params": variables["params"],
        "collections": {k: v for k, v in variables.items() if k != "params"},
    }
    # comma-separated restore_file = checkpoint ensemble (reference:
    # load_model_ensemble_and_task, checkpoint_utils.py:380); mode "average"
    # parameter-averages, "logprob" decodes with per-step averaged log-probs
    members = load_ensemble(
        ckpt, template, cfg.checkpoint.restore_file, cfg.checkpoint.ensemble_mode,
        strict=cfg.checkpoint.strict_ensemble,
    )
    if members is not None:
        trees = [{"params": m["params"], **m["collections"]} for m in members]
        variables = trees[0] if len(trees) == 1 else trees
        logger.info(
            "restored %s (%d member%s, mode=%s)",
            cfg.checkpoint.restore_file, len(trees), "s" if len(trees) > 1 else "",
            cfg.checkpoint.ensemble_mode,
        )
    else:
        logger.warning("no checkpoint found at %s — evaluating random init", cfg.checkpoint.save_dir)

    if cfg.generation.weight_quant and hasattr(task, "system"):
        # serving-format decode (generation.weight_quant=int8|int4): quantize
        # the LLaMA trunk once; fused Pallas dequant matmuls stream half /
        # a quarter of the weight bytes per decode step
        mode = cfg.generation.weight_quant
        if isinstance(variables, list):
            variables = [
                task.system.enable_quantized_decode(v, mode=mode) for v in variables
            ]
        else:
            variables = task.system.enable_quantized_decode(variables, mode=mode)
        logger.info("decoding with %s weight-only LLaMA", mode)

    constraints_by_id = None
    if cfg.generation.constraints_file:
        # fairseq-cli --constraints analog (fairseq/fairseq_cli/generate.py):
        # line N of the file carries the constraint phrases for manifest
        # sample N, tab-separated; phrases are tokenized with the task
        # tokenizer (no BOS) and enforced by constrained beam search
        # (ops/constraints.py + ops/beam_search.constrained_beam_search)
        tok = ds.tokenizer
        constraints_by_id = {}
        with open(cfg.generation.constraints_file) as f:
            for i, line in enumerate(f):
                phrases = [p for p in line.rstrip("\n").split("\t") if p.strip()]
                if phrases:
                    constraints_by_id[i] = [
                        tok.encode(p, add_bos=False) for p in phrases
                    ]
        mode = cfg.generation.constraints or "unordered"
        logger.info(
            "constrained decoding (%s): %d/%d utterances constrained",
            mode, len(constraints_by_id), len(ds),
        )

    hyps: List[str] = []
    refs: List[str] = []
    results = []
    for raw in PrefetchLoader(
        ds, ds.batches(max_tokens=cfg.dataset.max_tokens, batch_size=cfg.dataset.batch_size)
    ):
        batch = task.prepare_batch(raw, train=False)
        h, r = task.decode_to_text(
            variables, batch, raw["ids"], ds, cfg.generation,
            constraints_by_id=constraints_by_id,
        )
        for sample_id, hyp, ref in zip(raw["ids"], h, r):
            hyps.append(hyp)
            refs.append(ref)
            results.append({"id": int(sample_id), "hypo": hyp, "ref": ref})

    w, errs, words = wer(hyps, refs)
    os.makedirs(results_path, exist_ok=True)
    tag = hashlib.md5(json.dumps(vars(cfg.generation) if hasattr(cfg.generation, "__dict__") else {}, default=str).encode()).hexdigest()[:8]
    with open(os.path.join(results_path, f"hypo-{tag}.json"), "w") as f:
        json.dump(results, f, indent=2)
    with open(os.path.join(results_path, f"wer.{tag}"), "w") as f:
        f.write(f"WER: {w:.4f}\nerr / num_ref_words = {errs} / {words}\n")
    logger.info("WER %.4f (%d/%d)", w, errs, words)
    return {"wer": w, "errors": errs, "words": words}


def cli_main():
    from ._platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--results", default="results")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()
    tree = {}
    if args.config:
        merge(tree, load_yaml(args.config))
    apply_overrides(tree, args.overrides)
    cfg = from_dict(TrainRootConfig, tree)
    main(cfg, args.results)


if __name__ == "__main__":
    cli_main()
