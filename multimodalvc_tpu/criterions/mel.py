"""Mel-spectrogram losses and speech-quality metrics (MCD, SSIM).

Reference: src/criterionSpeech.py — masked L1 on 128-band log-mels with
per-sample lengths (:135-250), validation MCD via DCT-II cepstra (:20-67)
and Gaussian-window SSIM (:70-132).  Same formulas, expressed as jit-able
masked reductions.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_criterion
from ..ops.interpolate import length_mask


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Mean |pred-target| over valid frames only. pred/target: [B, T, D]."""
    mask = length_mask(lengths, pred.shape[1], dtype=pred.dtype)[..., None]
    diff = jnp.abs(pred - target) * mask
    denom = jnp.maximum(jnp.sum(mask) * pred.shape[-1], 1.0)
    return jnp.sum(diff) / denom


def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Type-II DCT rows (matches criterionSpeech.py:40-45)."""
    k = np.arange(n_mfcc)[:, None]
    n = np.arange(n_mels)[None, :]
    m = np.cos(np.pi * k * (2 * n + 1) / (2 * n_mels)) * math.sqrt(2.0 / n_mels)
    return m.astype(np.float32)


def compute_mcd(
    pred: jnp.ndarray, target: jnp.ndarray, lengths: Optional[jnp.ndarray] = None, n_mfcc: int = 13
) -> jnp.ndarray:
    """Mel cepstral distortion in dB over valid frames."""
    d = pred.shape[-1]
    m = jnp.asarray(dct_matrix(n_mfcc, d))
    mf_p = pred @ m.T
    mf_t = target @ m.T
    diff = mf_p[..., 1:] - mf_t[..., 1:]  # skip energy coeff
    frame = jnp.sqrt(jnp.maximum(jnp.sum(diff**2, axis=-1), 1e-12))  # [B, T]
    if lengths is not None:
        mask = length_mask(lengths, pred.shape[1], dtype=frame.dtype)
        mean = jnp.sum(frame * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    else:
        mean = jnp.mean(frame)
    return (10.0 * math.sqrt(2.0) / math.log(10.0)) * mean


def _gauss_kernel(window: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(window) - window // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def compute_ssim(pred: jnp.ndarray, target: jnp.ndarray, window: int = 11) -> jnp.ndarray:
    """Gaussian-window SSIM treating [B, T, D] spectrograms as images."""
    data_range = jnp.maximum(
        jnp.maximum(target.max() - target.min(), pred.max() - pred.min()), 1e-6
    )
    kern = jnp.asarray(_gauss_kernel(window))[:, :, None, None]  # HWIO
    pad = window // 2

    def filt(x):
        x4 = jnp.pad(x[..., None], ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            x4, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )[..., 0]

    mu_p, mu_t = filt(pred), filt(target)
    s_pp = filt(pred * pred) - mu_p**2
    s_tt = filt(target * target) - mu_t**2
    s_pt = filt(pred * target) - mu_p * mu_t
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * s_pt + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (s_pp + s_tt + c2)
    )
    return jnp.mean(ssim_map)


@dataclass
class MelL1Config:
    report_mcd: bool = True
    report_ssim: bool = True


@register_criterion("mel_spectrogram_l1", config=MelL1Config)
class MelL1Criterion:
    """Training loss = masked mel L1; validation adds MCD/SSIM
    (reference: src/criterionSpeech.py:135-250)."""

    def __init__(self, cfg: MelL1Config):
        self.cfg = cfg

    @classmethod
    def from_config(cls, cfg):
        return cls(cfg)

    def __call__(
        self, model_out: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray], train: bool = True
    ):
        pred = model_out["melspec"]
        target = batch["target_mel"]
        lengths = jnp.minimum(model_out["mel_lengths"], batch["target_mel_lengths"])
        t = min(pred.shape[1], target.shape[1])
        pred_t, target_t = pred[:, :t], target[:, :t]
        loss = masked_l1(pred_t, target_t, jnp.minimum(lengths, t))
        metrics = {"loss": loss, "mel_l1": loss}
        if not train:
            if self.cfg.report_mcd:
                metrics["mcd"] = compute_mcd(pred_t, target_t, jnp.minimum(lengths, t))
            if self.cfg.report_ssim:
                metrics["ssim"] = compute_ssim(pred_t, target_t)
        return loss, metrics
