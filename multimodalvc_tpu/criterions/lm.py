"""Decoder-only LM criterion with accuracy/ppl reporting.

Reference: src/criterion.py:20-144 (decoder_only_language_modeling_loss) —
the loss itself comes back from the model's LLaMA forward; the criterion
adds token accuracy and, at validation, beam-search WER (the WER pass lives
in the eval CLI here, where decode batching is controlled).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax.numpy as jnp

from ..config.registry import register_criterion


@dataclass
class LMCriterionConfig:
    label_smoothing: float = 0.0


@register_criterion("decoder_only_lm", config=LMCriterionConfig)
class LMCriterion:
    def __init__(self, cfg: LMCriterionConfig):
        self.cfg = cfg

    @classmethod
    def from_config(cls, cfg):
        return cls(cfg)

    def __call__(self, loss, aux: Dict[str, jnp.ndarray], train: bool = True):
        n_valid = jnp.maximum(aux["n_valid"], 1)
        metrics = {
            "loss": loss,
            "ppl": jnp.exp(loss),
            "accuracy": aux["n_correct"] / n_valid,
            "n_tokens": aux["n_valid"],
        }
        return loss, metrics
