"""MFCC + mini-batch k-means pretraining-label pipeline."""
import os
import subprocess
import sys

import numpy as np
import pytest

from multimodalvc_tpu.data.clustering import MiniBatchKMeans, mfcc_np

from tests.fixtures import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cluster")
    return make_corpus(str(root))


def test_mfcc_shape_and_rate(rng):
    wav = rng.standard_normal(16000).astype(np.float32)  # 1 s
    feats = mfcc_np(wav)
    assert feats.shape[1] == 39  # 13 mfcc + delta + ddelta
    assert 99 <= feats.shape[0] <= 102  # ~100 Hz
    assert np.isfinite(feats).all()


def test_kmeans_recovers_separated_clusters(rng):
    centers = np.asarray([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]], np.float32)
    data = np.concatenate(
        [c + 0.1 * rng.standard_normal((200, 2)).astype(np.float32) for c in centers]
    )
    km = MiniBatchKMeans(3, batch_size=128, seed=1).fit(data, epochs=10)
    labels = km.predict(data)
    # each true cluster maps to exactly one predicted label
    groups = [set(labels[i * 200 : (i + 1) * 200].tolist()) for i in range(3)]
    assert all(len(g) == 1 for g in groups)
    assert len(set().union(*groups)) == 3
    # centroids near the truth (up to permutation)
    d = np.linalg.norm(km.centroids[:, None] - centers[None], axis=-1)
    assert d.min(axis=0).max() < 0.5


@pytest.mark.slow
def test_cluster_cli_roundtrip(corpus, tmp_path):
    root, _ = corpus
    cent = str(tmp_path / "centroids.npy")
    km_out = str(tmp_path / "train.km")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "multimodalvc_tpu.cli.manifest_tools", "learn-kmeans",
         "--tsv", f"{root}/train.tsv", "--clusters", "8", "--epochs", "2",
         "--batch-size", "256", "--out", cent],
        capture_output=True, text=True, cwd=repo, env=env,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "multimodalvc_tpu.cli.manifest_tools", "dump-labels",
         "--tsv", f"{root}/train.tsv", "--centroids", cent, "--out", km_out],
        capture_output=True, text=True, cwd=repo, env=env,
    )
    assert r.returncode == 0, r.stderr
    rows = open(km_out).read().splitlines()
    assert len(rows) == 6
    ids = {int(t) for row in rows for t in row.split()}
    assert ids and max(ids) < 8
