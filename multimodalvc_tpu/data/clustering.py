"""Pretraining-label clustering: MFCC features + mini-batch k-means.

TPU-native rebuild of the reference's clustering pipeline
(avhubert/clustering/{dump_mfcc_feature,learn_kmeans,dump_km_label}.py):
the reference dumps torchaudio MFCCs to disk and fits sklearn
MiniBatchKMeans on CPU; here the features come from our shared STFT ops and
Lloyd iterations are one jit'd XLA program per batch, so the fit runs on the
accelerator.  Labels feed AV-HuBERT masked pretraining
(models/avhubert_pretrain.py).
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..criterions.mel import dct_matrix
from ..ops import stft as stft_ops

logger = logging.getLogger(__name__)


def mfcc_np(
    wav: np.ndarray,
    sample_rate: int = 16000,
    n_mfcc: int = 13,
    n_mels: int = 26,
    n_fft: int = 400,
    hop: int = 160,
    deltas: bool = True,
) -> np.ndarray:
    """[T] -> [T//hop, 39] MFCC + delta + delta-delta at 100 Hz.

    Matches the reference's 39-dim MFCC features for k-means label
    generation (avhubert/clustering/dump_mfcc_feature.py; avhubert stacks
    4x26-dim logfbank for the model input, hubert_dataset.py:286-287 — the
    cluster features are the cepstral variant)."""
    x = wav.astype(np.float32)
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * stft_ops.hann_window(n_fft)
    basis = stft_ops._dft_basis(n_fft, n_fft)
    proj = frames @ basis
    n_bins = n_fft // 2 + 1
    power = proj[:, :n_bins] ** 2 + proj[:, n_bins:] ** 2
    fb = stft_ops.mel_filterbank(
        sample_rate, n_fft, n_mels, fmin=20.0, fmax=sample_rate / 2, htk=True
    )
    logmel = np.log(np.maximum(power @ fb, 1e-10))  # fb is [n_bins, n_mels]
    mfcc = logmel @ dct_matrix(n_mfcc, n_mels).T
    if not deltas:
        return mfcc.astype(np.float32)

    def delta(feat: np.ndarray, n: int = 2) -> np.ndarray:
        denom = 2 * sum(i * i for i in range(1, n + 1))
        padded = np.pad(feat, ((n, n), (0, 0)), mode="edge")
        out = np.zeros_like(feat)
        for i in range(1, n + 1):
            out += i * (padded[n + i : n + i + len(feat)] - padded[n - i : n - i + len(feat)])
        return out / denom

    d1 = delta(mfcc)
    d2 = delta(d1)
    return np.concatenate([mfcc, d1, d2], axis=1).astype(np.float32)


@partial(jax.jit, static_argnames=("k",))
def _assign(feats: jnp.ndarray, centroids: jnp.ndarray, k: int) -> jnp.ndarray:
    """[N, D], [K, D] -> [N] nearest-centroid ids (one matmul on the MXU)."""
    # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin ignores ||x||^2
    scores = feats @ centroids.T - 0.5 * jnp.sum(centroids**2, axis=1)[None, :]
    return jnp.argmax(scores, axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def _minibatch_update(
    feats: jnp.ndarray, centroids: jnp.ndarray, counts: jnp.ndarray, k: int
):
    """One MiniBatchKMeans step (Sculley'10, what sklearn implements):
    per-centroid running-mean update with per-assignment learning rates."""
    assign = _assign(feats, centroids, k)
    one_hot = jax.nn.one_hot(assign, k, dtype=feats.dtype)  # [N, K]
    batch_counts = one_hot.sum(axis=0)  # [K]
    new_counts = counts + batch_counts
    sums = one_hot.T @ feats  # [K, D]
    # running mean: c' = c + (sum - n_batch * c) / new_count
    lr = jnp.where(new_counts > 0, 1.0 / jnp.maximum(new_counts, 1.0), 0.0)
    centroids = centroids + lr[:, None] * (sums - batch_counts[:, None] * centroids)
    inertia = jnp.sum(feats**2) - jnp.sum(
        one_hot * (feats @ centroids.T), axis=None
    )
    return centroids, new_counts, inertia


class MiniBatchKMeans:
    """Accelerator-resident mini-batch k-means (learn_kmeans.py analog)."""

    def __init__(self, n_clusters: int, batch_size: int = 10000, seed: int = 0):
        self.k = n_clusters
        self.batch_size = batch_size
        self.seed = seed
        self.centroids: Optional[np.ndarray] = None

    def fit(self, feats: np.ndarray, epochs: int = 5) -> "MiniBatchKMeans":
        rng = np.random.default_rng(self.seed)
        n = len(feats)
        init_idx = rng.choice(n, size=self.k, replace=n < self.k)
        centroids = jnp.asarray(feats[init_idx], jnp.float32)
        counts = jnp.zeros((self.k,), jnp.float32)
        for epoch in range(epochs):
            order = rng.permutation(n)
            last_inertia = 0.0
            for s in range(0, n - self.batch_size + 1, self.batch_size) or [0]:
                batch = jnp.asarray(feats[order[s : s + self.batch_size]], jnp.float32)
                centroids, counts, inertia = _minibatch_update(
                    batch, centroids, counts, self.k
                )
                last_inertia = float(inertia)
            logger.info("kmeans epoch %d inertia %.4g", epoch, last_inertia)
        self.centroids = np.asarray(centroids)
        return self

    def predict(self, feats: np.ndarray) -> np.ndarray:
        if self.centroids is None:
            raise RuntimeError("fit first")
        return np.asarray(
            _assign(jnp.asarray(feats, jnp.float32), jnp.asarray(self.centroids), self.k)
        )

    def save(self, path: str) -> None:
        np.save(path, self.centroids)

    @classmethod
    def load(cls, path: str) -> "MiniBatchKMeans":
        c = np.load(path)
        km = cls(n_clusters=len(c))
        km.centroids = c
        return km


def dump_labels_for_manifest(
    tsv_path: str, km: MiniBatchKMeans, out_path: str, feature_fn=mfcc_np
) -> int:
    """Write one space-separated label row per manifest clip
    (dump_km_label.py analog; .km files consumed by pretraining)."""
    import os

    from .audio import read_wav

    n = 0
    with open(tsv_path) as f, open(out_path, "w") as out:
        root = f.readline().strip()
        for line in f:
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 3:
                continue
            audio = cols[2].split(":")[0]
            path = audio if os.path.isabs(audio) else os.path.join(root, audio)
            labels = km.predict(feature_fn(read_wav(path)))
            out.write(" ".join(map(str, labels.tolist())) + "\n")
            n += 1
    return n
