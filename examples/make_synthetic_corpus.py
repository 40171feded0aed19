"""Generate a tiny synthetic AVSR corpus: manifest TSVs + .wrd transcripts +
npy mouth-ROI videos + wavs + a babble-noise track.

The on-disk format matches the reference's manifest layout
(manifest/433h/test.tsv: root line, then
`dataset \t video \t audio \t n_frames \t n_samples \t speech_rate`
rows, one transcript per line in the .wrd file).  Public analog of
fairseq's create_dummy_data (fairseq/tests/utils.py:162).
"""
import argparse
import os

import numpy as np
from scipy.io import wavfile


def make_corpus(root, n=8, sr=16000, seed=0, frame_sizes=(10, 14, 16)):
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
        wav = (
            0.1 * np.sin(2 * np.pi * (200 + 50 * i) * np.arange(n_samples) / sr)
        ).astype(np.float32)
        ap = os.path.join("data", f"clip{i}.wav")
        wavfile.write(os.path.join(root, ap), sr, (wav * 32767).astype(np.int16))
        rows.append(f"synthetic\t{vp}\t{ap}:{i}\t{t_v}\t{n_samples}\t1.0")
        labels.append(" ".join(rng.choice(words, size=3)))
    for subset in ("train", "valid", "test"):
        with open(os.path.join(root, f"{subset}.tsv"), "w") as f:
            f.write(root + "\n" + "\n".join(rows) + "\n")
        with open(os.path.join(root, f"{subset}.wrd"), "w") as f:
            f.write("\n".join(labels) + "\n")
    noise = (0.05 * rng.standard_normal(sr * 5)).astype(np.float32)
    noise_path = os.path.join(root, "babble.wav")
    wavfile.write(noise_path, sr, (noise * 32767).astype(np.int16))
    print(f"corpus: {root} ({n} clips), noise: {noise_path}")
    return root, noise_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root", nargs="?", default="/tmp/mmvc_corpus")
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()
    make_corpus(args.root, n=args.n)
