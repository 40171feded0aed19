"""Host-side audio: WAV IO, babble-noise augmentation, Whisper features.

Reference: src/dataset.py:249-318 — scipy wavfile read, int16 -> [-1,1),
train-time noise mixing at random SNR in {-5..20} dB, WhisperProcessor
80-bin features padded to 30 s.  The feature extractor here is the same
matmul-DFT engine as the device path (ops/stft.py) evaluated with numpy, so
host features and any on-device recomputation agree bit-for-bit in fp32.
"""
from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np
from scipy.io import wavfile

from ..ops import stft as stft_ops
from ..ops.audio import SNR_LEVELS, add_noise_snr, pcm16_to_float, sample_noise_segment

logger = logging.getLogger(__name__)


def read_wav(path: str, expected_sr: int = 16000) -> np.ndarray:
    sr, data = wavfile.read(path)
    if sr != expected_sr:
        raise ValueError(f"{path}: sample rate {sr} != {expected_sr}")
    if data.ndim > 1:
        data = data[:, 0]
    return pcm16_to_float(data)


def write_wav(path: str, wav: np.ndarray, sr: int = 16000) -> None:
    wavfile.write(path, sr, np.clip(wav, -1.0, 1.0).astype(np.float32))


class NoiseMixer:
    """Babble-noise augmentation (src/dataset.py:249-259)."""

    def __init__(self, noise_wav_path: Optional[str], seed: int = 0):
        self.noise = read_wav(noise_wav_path) if noise_wav_path else None
        self.rng = np.random.default_rng(seed)

    def __call__(self, wav: np.ndarray, snr_db: Optional[float] = None) -> np.ndarray:
        if self.noise is None:
            return wav
        seg = sample_noise_segment(self.noise, len(wav), self.rng)
        snr = snr_db if snr_db is not None else float(self.rng.choice(SNR_LEVELS))
        return np.asarray(add_noise_snr(wav, seg, snr))


def _whisper_log_mel_core(wav: np.ndarray, n_mels: int) -> np.ndarray:
    """Shared STFT/mel/log-normalize math of the two whisper extractors
    (global max-8 clamp, +4, /4 — openai/whisper audio.py semantics)."""
    n_fft, hop = stft_ops.WHISPER_N_FFT, stft_ops.WHISPER_HOP
    x = np.pad(wav.astype(np.float32), (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx]
    basis = stft_ops._dft_basis(n_fft, n_fft)
    proj = frames @ basis
    n_bins = n_fft // 2 + 1
    mag2 = proj[:, :n_bins] ** 2 + proj[:, n_bins:] ** 2
    mag2 = mag2[:-1]  # whisper drops the trailing frame
    fb = stft_ops.mel_filterbank(stft_ops.WHISPER_SR, n_fft, n_mels)
    mel = mag2 @ fb
    log_spec = np.log10(np.clip(mel, 1e-10, None))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return np.ascontiguousarray(log_spec.T.astype(np.float32))


def whisper_features_np(wav: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """[T] float32 -> [80, 3000] whisper log-mel, pure numpy (worker-safe)."""
    n = stft_ops.WHISPER_N_SAMPLES
    if len(wav) >= n:
        wav = wav[:n]
    else:
        wav = np.pad(wav, (0, n - len(wav)))
    return _whisper_log_mel_core(wav, n_mels)


def whisper_features_long_np(wav: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """[T] float32 -> [80, T//160] whisper log-mel over the FULL clip.

    Long-form companion of ``whisper_features_np``: identical STFT/mel/log
    math (shared ``_whisper_log_mel_core``) without the 30 s truncation, for
    ``AVSRSystem.generate_long_form`` which slices 30 s windows per decode
    chunk.  Normalization is GLOBAL over the clip instead of whisper's
    per-30 s-window max — decode chunks slide at arbitrary offsets here, and
    a per-window max would put normalization seams inside chunks; matches
    ``whisper_features_np`` exactly on interior frames of <= 30 s clips
    (tested)."""
    wav = np.asarray(wav, np.float32)
    n_fft = stft_ops.WHISPER_N_FFT
    if len(wav) < n_fft:
        wav = np.pad(wav, (0, n_fft - len(wav)))
    return _whisper_log_mel_core(wav, n_mels)


def hifigan_mel_np(wav: np.ndarray) -> np.ndarray:
    """[T] -> [T//160, 128] natural-log mel targets (offline extractor
    equivalent of src/generateLogMel-Spectrograms.py)."""
    n_fft, hop, n_mels = 1024, 160, 128
    pad = (n_fft - hop) // 2
    x = np.pad(wav.astype(np.float32), (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx]
    basis = stft_ops._dft_basis(n_fft, n_fft)
    proj = frames @ basis
    n_bins = n_fft // 2 + 1
    mag2 = proj[:, :n_bins] ** 2 + proj[:, n_bins:] ** 2
    fb = stft_ops.mel_filterbank(16000, n_fft, n_mels, 0.0, 8000.0)
    mel = mag2 @ fb
    return np.log(np.clip(mel, 1e-5, None)).astype(np.float32)


def stacked_logfbank_np(wav: np.ndarray, n_mels: int = 26, stack: int = 4) -> np.ndarray:
    """[T] -> [T_frames//stack, n_mels*stack] log-filterbank at 25 Hz.

    AV-HuBERT's audio front end (reference: avhubert/hubert_dataset.py:286-287
    — python_speech_features logfbank + 4-frame stacking to video rate)."""
    n_fft, hop = 400, 160  # 25 ms / 10 ms at 16 kHz
    x = np.pad(wav.astype(np.float32), (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * stft_ops.hann_window(n_fft)
    basis = stft_ops._dft_basis(n_fft, n_fft)
    proj = frames @ basis
    n_bins = n_fft // 2 + 1
    power = proj[:, :n_bins] ** 2 + proj[:, n_bins:] ** 2
    fb = stft_ops.mel_filterbank(16000, n_fft, n_mels, fmin=20.0, htk=True)
    logmel = np.log(np.maximum(power @ fb, 1e-10))
    t = (len(logmel) // stack) * stack
    return logmel[:t].reshape(-1, stack * n_mels).astype(np.float32)
