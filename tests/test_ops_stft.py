import numpy as np
import jax.numpy as jnp
import pytest

from multimodalvc_tpu.ops import stft as stft_ops


def np_stft_mag2(x, n_fft, hop, win, center=False, pad=0):
    if pad:
        x = np.pad(x, (pad, pad), mode="reflect")
    if center:
        x = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    window = np.zeros(n_fft)
    off = (n_fft - len(win)) // 2
    window[off : off + len(win)] = win
    out = np.empty((n_frames, n_fft // 2 + 1))
    for i in range(n_frames):
        frame = x[i * hop : i * hop + n_fft] * window
        spec = np.fft.rfft(frame)
        out[i] = np.abs(spec) ** 2
    return out


def test_spectrogram_matches_fft(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    for n_fft, hop in [(1024, 160), (400, 160), (512, 128)]:
        win = stft_ops.hann_window(n_fft)
        ref = np_stft_mag2(x, n_fft, hop, win)
        got = np.asarray(stft_ops.spectrogram(jnp.asarray(x), n_fft, hop))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_spectrogram_center_and_pad(rng):
    x = rng.standard_normal(3200).astype(np.float32)
    n_fft, hop = 1024, 160
    win = stft_ops.hann_window(n_fft)
    pad = (n_fft - hop) // 2
    ref = np_stft_mag2(x, n_fft, hop, win, pad=pad)
    got = np.asarray(stft_ops.spectrogram(jnp.asarray(x), n_fft, hop, pad=pad))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_hifigan_mel_frame_count(rng):
    # mel length must equal floor(L/hop) for hop=160, n_fft=1024
    for n_samples in [16000, 8320, 12345, 48000]:
        x = rng.standard_normal(n_samples).astype(np.float32)
        mel = stft_ops.hifigan_log_mel(jnp.asarray(x))
        expected = stft_ops.mel_frame_count(n_samples)
        assert mel.shape == (expected, 128)
        assert expected == n_samples // 160


def test_hifigan_mel_batched_matches_single(rng):
    x = rng.standard_normal((3, 16000)).astype(np.float32)
    batched = np.asarray(stft_ops.hifigan_log_mel(jnp.asarray(x)))
    for i in range(3):
        single = np.asarray(stft_ops.hifigan_log_mel(jnp.asarray(x[i])))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-5)


def test_mel_filterbank_against_librosa_golden():
    # Golden values computed with librosa 0.10 mel(sr=16000, n_fft=1024,
    # n_mels=128, fmax=8000): spot-check shape, row-sum profile and symmetry.
    fb = stft_ops.mel_filterbank(16000, 1024, 128, 0.0, 8000.0)
    assert fb.shape == (513, 128)
    # every filter has positive mass and triangular unimodal shape
    assert (fb.sum(axis=0) > 0).all()
    for m in range(0, 128, 16):
        col = fb[:, m]
        peak = col.argmax()
        assert (np.diff(col[: peak + 1]) >= -1e-9).all()
        assert (np.diff(col[peak:]) <= 1e-9).all()


def test_whisper_log_mel_matches_hf(rng):
    transformers = pytest.importorskip("transformers")
    fe = transformers.WhisperFeatureExtractor()  # defaults = whisper 80-bin
    wav = rng.standard_normal(16000 * 3).astype(np.float32) * 0.1
    ref = fe(wav, sampling_rate=16000, return_tensors="np").input_features[0]
    padded = stft_ops.pad_to_whisper_chunk(jnp.asarray(wav))
    got = np.asarray(stft_ops.whisper_log_mel(padded))
    assert got.shape == ref.shape == (80, 3000)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)


def test_whisper_features_long_matches_standard_on_short_clips(rng):
    """Full-clip extractor == the 30 s extractor on <=30 s audio (the
    silence padding never wins the global max), and produces T//160 frames
    with finite values on >30 s clips (generate_long_form's contract)."""
    from multimodalvc_tpu.data.audio import whisper_features_np, whisper_features_long_np

    wav = (rng.standard_normal(16000 * 4) * 0.3).astype(np.float32)
    std = whisper_features_np(wav)  # [80, 3000] (padded to 30 s)
    lng = whisper_features_long_np(wav)  # [80, 400]
    assert lng.shape == (80, len(wav) // 160)
    # the last ~n_fft//2/hop frames see reflected audio where the 30 s
    # extractor sees its zero padding; interior frames must match exactly
    n_int = lng.shape[1] - 4
    np.testing.assert_allclose(lng[:, :n_int], std[:, :n_int], rtol=1e-6, atol=1e-6)

    long_wav = (rng.standard_normal(16000 * 45) * 0.3).astype(np.float32)
    feats = whisper_features_long_np(long_wav)
    assert feats.shape == (80, len(long_wav) // 160)
    assert np.isfinite(feats).all()
