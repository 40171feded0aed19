"""STFT and log-mel front ends, TPU-first.

One spectrogram engine serves both front ends of the pipeline:
 * Whisper 80-bin log-mel input features (reference:
   src/dataset.py:310 via HF WhisperProcessor — n_fft=400, hop=160,
   center=True reflect, log10 + max-8 clamp, (x+4)/4 scaling), and
 * HiFi-GAN 128-band natural-log mel targets (reference:
   src/generateLogMel-Spectrograms.py:9-16,52-76 and
   src/criterionSpeechE2E.py:37-74 — n_fft=1024, hop=160, center=False with
   manual reflect pad (n_fft-hop)/2, power=2, slaney scale, fmin=0 fmax=8000,
   ln clamp 1e-5).

Instead of an FFT, the STFT is computed as a single real matmul with a
precomputed windowed-DFT basis: frames [N, n_fft] @ basis [n_fft, 2*n_bins].
For these sizes (n_fft 400/1024) the matmul form runs on the MXU, fuses with
the mel projection (another matmul) and avoids XLA's FFT path entirely, so
the whole front end is two MXU ops + one elementwise log.  It is also
trivially differentiable, which the E2E GAN loss needs.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    return w[:win_length].astype(np.float32)


def hz_to_mel(f: np.ndarray, htk: bool = False) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz(m: np.ndarray, htk: bool = False) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
) -> np.ndarray:
    """librosa-compatible triangular mel filterbank, shape [n_bins, n_mels]."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(np.array(fmin), htk), hz_to_mel(np.array(fmax), htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts.reshape(-1, 1) - fft_freqs.reshape(1, -1)
    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm.reshape(-1, 1)
    return weights.T.astype(np.float32)  # [n_bins, n_mels]


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT basis: [n_fft, 2 * n_bins] -> (real | imag) parts."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft).reshape(-1, 1)
    k = np.arange(n_bins).reshape(1, -1)
    angle = -2.0 * np.pi * t * k / n_fft
    window = np.zeros(n_fft, dtype=np.float64)
    off = (n_fft - win_length) // 2
    window[off : off + win_length] = hann_window(win_length)
    basis = np.concatenate([np.cos(angle), np.sin(angle)], axis=1) * window.reshape(-1, 1)
    return basis.astype(np.float32)


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, n_fft] via a strided gather (XLA-friendly)."""
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[..., idx]


def spectrogram(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: Optional[int] = None,
    power: float = 2.0,
    center: bool = False,
    pad: int = 0,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Magnitude/power spectrogram. x: [..., T] -> [..., n_frames, n_bins].

    ``center=True`` reflect-pads n_fft//2 on both sides (torch/librosa
    semantics); ``pad`` adds explicit symmetric padding first (HiFi-GAN's
    manual (n_fft-hop)//2 reflect pad).
    """
    win_length = win_length or n_fft
    if pad > 0:
        cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, cfg, mode=pad_mode)
    if center:
        cfg = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, cfg, mode=pad_mode)
    frames = frame_signal(x.astype(jnp.float32), n_fft, hop)
    basis = jnp.asarray(_dft_basis(n_fft, win_length))
    proj = jnp.einsum("...tf,fk->...tk", frames, basis, precision=jax.lax.Precision.HIGHEST)
    n_bins = n_fft // 2 + 1
    re, im = proj[..., :n_bins], proj[..., n_bins:]
    mag_sq = re * re + im * im
    if power == 2.0:
        return mag_sq
    if power == 1.0:
        return jnp.sqrt(jnp.maximum(mag_sq, 1e-20))
    return jnp.power(jnp.maximum(mag_sq, 1e-20), power / 2.0)


def hifigan_log_mel(
    wav: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 1024,
    hop: int = 160,
    win_length: int = 1024,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    norm: Optional[str] = "slaney",
) -> jnp.ndarray:
    """128-band 100 Hz natural-log mel, [..., T] -> [..., n_frames, n_mels].

    Matches reference src/generateLogMel-Spectrograms.py:52-76 (center=False,
    manual reflect pad (n_fft-hop)//2, power=2, ln clamp 1e-5).  Output is
    time-major [T, 128] like the saved ``*_mel_100hz_128bands.pt`` targets.
    """
    spec = spectrogram(wav, n_fft, hop, win_length, power=2.0, pad=(n_fft - hop) // 2)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, norm=norm))
    mel = jnp.einsum("...tk,km->...tm", spec, fb, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


WHISPER_SR = 16000
WHISPER_N_FFT = 400
WHISPER_HOP = 160
WHISPER_N_MELS = 80
WHISPER_CHUNK_SECONDS = 30
WHISPER_N_SAMPLES = WHISPER_SR * WHISPER_CHUNK_SECONDS  # 480000
WHISPER_N_FRAMES = WHISPER_N_SAMPLES // WHISPER_HOP  # 3000


def whisper_log_mel(wav: jnp.ndarray, n_mels: int = WHISPER_N_MELS) -> jnp.ndarray:
    """Whisper input features: [..., 480000] -> [..., 80, 3000].

    Matches openai-whisper ``log_mel_spectrogram`` (used by the reference via
    WhisperProcessor, src/dataset.py:310): hann window, center reflect pad,
    power spectrum with the final frame dropped, slaney mel, log10 with a
    per-sample (max - 8) floor, then (x + 4) / 4.  The caller pads/truncates
    to 30 s (use :func:`pad_to_whisper_chunk`).
    """
    spec = spectrogram(wav, WHISPER_N_FFT, WHISPER_HOP, power=2.0, center=True)
    spec = spec[..., :-1, :]  # whisper drops the trailing frame
    fb = jnp.asarray(
        mel_filterbank(WHISPER_SR, WHISPER_N_FFT, n_mels, norm="slaney", htk=False)
    )
    mel = jnp.einsum("...tk,km->...tm", spec, fb, precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    maxval = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, maxval - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, -1, -2)  # [..., n_mels, n_frames]


def pad_to_whisper_chunk(wav: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad / truncate the last axis to exactly 30 s (480000 samples)."""
    t = wav.shape[-1]
    if t >= WHISPER_N_SAMPLES:
        return wav[..., :WHISPER_N_SAMPLES]
    cfg = [(0, 0)] * (wav.ndim - 1) + [(0, WHISPER_N_SAMPLES - t)]
    return jnp.pad(wav, cfg)


def mel_frame_count(n_samples: int, n_fft: int = 1024, hop: int = 160) -> int:
    """Frames produced by hifigan_log_mel for an n_samples waveform.

    floor((L + 2*pad - n_fft)/hop) + 1 with pad=(n_fft-hop)//2, which
    simplifies to floor(L/hop) for these values (reference:
    src/modelSpeech.py:246-252).
    """
    pad = (n_fft - hop) // 2
    return (n_samples + 2 * pad - n_fft) // hop + 1
