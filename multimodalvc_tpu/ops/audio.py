"""Waveform-level ops: SNR noise mixing, normalization.

Replaces ``torchaudio.functional.add_noise`` used for babble-noise
augmentation (reference: src/dataset.py:249-259 — random SNR from
{-5,0,5,10,15,20} dB on the train subset, fixed SNR for eval sweeps).
Implemented as pure jnp so it can run inside the jit'd input pipeline or on
host numpy arrays alike.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SNR_LEVELS = (-5.0, 0.0, 5.0, 10.0, 15.0, 20.0)


def add_noise_snr(speech, noise, snr_db, eps: float = 1e-10):
    """Mix ``noise`` into ``speech`` at a target SNR in dB.

    torchaudio semantics: noise is scaled so that
    10*log10(P_speech / P_noise_scaled) == snr_db; supports leading batch
    dims as long as shapes broadcast.
    """
    xp = jnp if isinstance(speech, jnp.ndarray) else np
    speech_power = xp.sum(speech**2, axis=-1, keepdims=True)
    noise_power = xp.sum(noise**2, axis=-1, keepdims=True)
    snr = 10.0 ** (xp.asarray(snr_db, dtype=speech.dtype) / 10.0)
    scale = xp.sqrt(speech_power / (snr * noise_power + eps) + eps)
    return speech + scale * noise


def sample_noise_segment(noise: np.ndarray, length: int, rng: np.random.Generator) -> np.ndarray:
    """Random contiguous segment of the (long) noise track, tiled if short."""
    if noise.shape[-1] < length:
        reps = -(-length // noise.shape[-1])
        noise = np.tile(noise, reps)
    start = int(rng.integers(0, noise.shape[-1] - length + 1))
    return noise[..., start : start + length]


def pcm16_to_float(wav: np.ndarray) -> np.ndarray:
    """int16 PCM -> float32 in [-1, 1) (reference: src/dataset.py:296-299)."""
    if wav.dtype == np.int16:
        return (wav / 32768.0).astype(np.float32)
    return wav.astype(np.float32)
