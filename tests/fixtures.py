"""Synthetic dataset fixture: tiny manifest + npy videos + wavs.

The JAX analog of fairseq's create_dummy_data (fairseq/tests/utils.py:162):
writes a real on-disk corpus the data layer and CLIs can consume.
"""
import os

import numpy as np
from scipy.io import wavfile


def make_corpus(root, n=6, sr=16000, seed=0, frame_sizes=(30, 45, 60)):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    words = ["hello", "world", "speech", "video", "test", "audio"]
    rows, labels = [], []
    for i in range(n):
        t_v = int(frame_sizes[i % len(frame_sizes)])
        n_samples = t_v * 640  # 25 fps video, 16 kHz audio
        video = rng.integers(0, 255, (t_v, 96, 96), dtype=np.uint8)
        vp = os.path.join("data", f"clip{i}.npy")
        np.save(os.path.join(root, vp), video)
        wav = (0.1 * np.sin(2 * np.pi * (200 + 50 * i) * np.arange(n_samples) / sr)).astype(
            np.float32
        )
        ap = os.path.join("data", f"clip{i}.wav")
        wavfile.write(os.path.join(root, ap), sr, (wav * 32767).astype(np.int16))
        rows.append(f"synthetic\t{vp}\t{ap}:{i}\t{t_v}\t{n_samples}\t1.0")
        labels.append(" ".join(rng.choice(words, size=3)))
    for subset in ("train", "valid", "test"):
        with open(os.path.join(root, f"{subset}.tsv"), "w") as f:
            f.write(root + "\n" + "\n".join(rows) + "\n")
        with open(os.path.join(root, f"{subset}.wrd"), "w") as f:
            f.write("\n".join(labels) + "\n")
    # babble noise track
    noise = (0.05 * rng.standard_normal(sr * 5)).astype(np.float32)
    noise_path = os.path.join(root, "babble.wav")
    wavfile.write(noise_path, sr, (noise * 32767).astype(np.int16))
    return root, noise_path
