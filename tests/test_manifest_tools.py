import os
import subprocess
import sys

import numpy as np
import pytest

from tests.fixtures import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mtools")
    return make_corpus(str(root))


def run_tool(*args):
    return subprocess.run(
        [sys.executable, "-m", "multimodalvc_tpu.cli.manifest_tools", *args],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def test_hours(corpus):
    root, _ = corpus
    r = run_tool("hours", "--tsv", f"{root}/train.tsv")
    assert r.returncode == 0, r.stderr
    assert "total hours" in r.stdout


def test_split(corpus, tmp_path):
    root, _ = corpus
    out = tmp_path / "splits"
    out.mkdir()
    r = run_tool(
        "split", "--tsv", f"{root}/train.tsv", "--out-dir", str(out),
        "--valid-frac", "0.2", "--test-frac", "0.2",
    )
    assert r.returncode == 0, r.stderr
    lens = {}
    for name in ("train", "valid", "test"):
        with open(out / f"{name}.tsv") as f:
            lens[name] = len(f.readlines()) - 1
        assert os.path.exists(out / f"{name}.wrd")
    assert sum(lens.values()) == 6
    assert lens["valid"] == 1 and lens["test"] == 1


def test_normalize_rates(corpus, tmp_path):
    root, _ = corpus
    out = tmp_path / "norm.tsv"
    r = run_tool("normalize-rates", "--tsv", f"{root}/train.tsv", "--out", str(out))
    assert r.returncode == 0, r.stderr
    with open(out) as f:
        f.readline()
        rates = [float(ln.split("\t")[5]) for ln in f]
    assert all(1.0 <= x <= 2.0 for x in rates)


def test_generate_manifest(tmp_path):
    # build a mini corpus layout: video/*.npy + side-by-side wavs + text/
    from scipy.io import wavfile

    vd = tmp_path / "video"
    td = tmp_path / "text"
    vd.mkdir()
    td.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(vd / f"c{i}.npy", rng.integers(0, 255, (20, 32, 32), dtype=np.uint8))
        wav = (rng.standard_normal(12800) * 0.05).astype(np.float32)
        wavfile.write(vd / f"c{i}.wav", 16000, (wav * 32767).astype(np.int16))
        (td / f"c{i}.txt").write_text("hallo welt test")
    out_tsv = tmp_path / "all.tsv"
    r = run_tool(
        "generate", "--root", str(tmp_path), "--video-dir", "video",
        "--text-dir", "text", "--out-tsv", str(out_tsv), "--workers", "2",
    )
    assert r.returncode == 0, r.stderr
    with open(out_tsv) as f:
        lines = f.readlines()
    assert len(lines) == 4  # root + 3 entries
    parts = lines[1].split("\t")
    assert int(parts[3]) == 20 and int(parts[4]) == 12800
    assert os.path.exists(tmp_path / "all.wrd")


def test_update_paths(corpus, tmp_path):
    root, _ = corpus
    out = tmp_path / "upd.tsv"
    r = run_tool("update-paths", "--tsv", f"{root}/train.tsv", "--old", "data/", "--new", "DATA/", "--out", str(out))
    assert r.returncode == 0, r.stderr
    assert "DATA/clip0.npy" in open(out).read()


@pytest.mark.slow
def test_generate_mels(corpus):
    root, _ = corpus
    r = run_tool("generate-mels", "--tsv", f"{root}/train.tsv", "--workers", "2")
    assert r.returncode == 0, r.stderr
    mels = [f for f in os.listdir(f"{root}/data") if f.endswith("_mel_100hz_128bands.npy")]
    assert len(mels) == 6
    mel = np.load(f"{root}/data/{mels[0]}")
    assert mel.ndim == 2 and mel.shape[1] == 128
    # matches the on-the-fly extractor exactly
    from multimodalvc_tpu.data.audio import hifigan_mel_np, read_wav

    stem = mels[0].replace("_mel_100hz_128bands.npy", "")
    ref = hifigan_mel_np(read_wav(f"{root}/data/{stem}.wav"))
    np.testing.assert_allclose(mel, ref, rtol=1e-5, atol=1e-6)
    # idempotent without --overwrite
    r2 = run_tool("generate-mels", "--tsv", f"{root}/train.tsv")
    assert "wrote 0/6" in r2.stdout


def test_filter_language(corpus, tmp_path):
    root, _ = corpus
    meta = tmp_path / "meta.csv"
    meta.write_text("id,language\nclip0,de\nclip2,de\nclip1,en\n")
    out = tmp_path / "german.tsv"
    r = run_tool(
        "filter-language", "--tsv", f"{root}/train.tsv", "--wrd", f"{root}/train.wrd",
        "--meta", str(meta), "--language", "de", "--out", str(out),
    )
    assert r.returncode == 0, r.stderr
    assert "kept 2/6" in r.stdout
    rows = out.read_text().splitlines()
    assert len(rows) == 3  # root + 2 clips
    assert "clip0" in rows[1] and "clip2" in rows[2]
    labels = (tmp_path / "german.tsv.wrd").read_text().splitlines()
    assert len(labels) == 2


@pytest.mark.slow
def test_make_babble(corpus, tmp_path):
    from scipy.io import wavfile

    root, _ = corpus
    out = str(tmp_path / "babble.wav")
    r = run_tool("make-babble", "--tsv", f"{root}/train.tsv", "--n", "4", "--out", out)
    assert r.returncode == 0, r.stderr
    sr, data = wavfile.read(out)
    assert sr == 16000 and len(data) > 16000 * 0.3
    assert np.abs(data).max() <= 1.0 + 1e-6


@pytest.mark.slow
def test_inspect_checkpoint(tmp_path):
    import torch

    sd = {"enc.w": torch.randn(4, 4), "enc.b": torch.randn(4), "head.w": torch.randn(2, 4)}
    torch.save(sd, tmp_path / "m.pt")
    r = subprocess.run(
        [sys.executable, "-m", "multimodalvc_tpu.cli.inspect_checkpoint",
         str(tmp_path / "m.pt"), "--depth", "1"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stderr
    assert "3 keys" in r.stdout and "enc" in r.stdout and "head" in r.stdout
