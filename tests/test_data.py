import numpy as np
import pytest

from multimodalvc_tpu.data import (
    AVSRDataset,
    AVSRDatasetConfig,
    PrefetchLoader,
    batch_by_size,
    load_manifest,
)
from multimodalvc_tpu.utils.wer import cer, edit_distance, wer

from tests.fixtures import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_corpus(str(root))


def test_manifest_parse_and_filter(corpus):
    root, _ = corpus
    m = load_manifest(f"{root}/train.tsv", label_path=f"{root}/train.wrd")
    assert len(m) == 6
    assert len(m.labels) == 6
    assert m.entries[0].n_video_frames == 30
    m2 = load_manifest(f"{root}/train.tsv", max_keep_frames=50)
    assert len(m2) == 4  # 60-frame clips dropped


def test_batch_by_size_buckets():
    sizes = [30, 45, 60, 30, 45, 60, 31]
    batches = batch_by_size(sizes, max_tokens=200, buckets=(32, 48, 64))
    covered = sorted(int(i) for b in batches for i in b)
    assert covered == list(range(7))
    # same-bucket grouping
    for b in batches:
        bks = {min(bk for bk in (32, 48, 64) if sizes[int(i)] <= bk) for i in b}
        assert len(bks) == 1
    # token budget respected
    for b in batches:
        bucket = max(min(bk for bk in (32, 48, 64) if sizes[int(i)] <= bk) for i in b)
        assert len(b) * bucket <= 200


def test_dataset_item_and_collate(corpus):
    root, noise = corpus
    cfg = AVSRDatasetConfig(
        manifest_dir=root,
        subset="train",
        noise_wav=noise,
        noise_prob=1.0,
        length_buckets=(32, 48, 64),
        max_label_tokens=24,
        with_mel_targets=True,
        with_waveform=True,
    )
    ds = AVSRDataset(cfg)
    s = ds[0]
    assert s["video"].shape == (30, 88, 88, 1)
    assert s["audio_feats"].shape == (80, 3000)
    assert s["labels"][-1] == ds.tokenizer.eos_token_id
    assert s["target_mel"].shape[1] == 128

    batches = ds.batches(max_tokens=128)
    loader = PrefetchLoader(ds, batches, num_workers=2)
    seen = 0
    for batch in loader:
        b, t_v = batch["video"].shape[:2]
        assert t_v in (32, 48, 64)
        assert batch["audio_feats"].shape == (b, 80, 3000)
        assert batch["labels"].shape[1] == 24
        assert batch["instruction"].shape[0] == b
        assert batch["target_mel"].shape[1:] == (cfg.max_mel_frames, 128)
        assert batch["waveform"].shape[1] == cfg.max_mel_frames * 160
        seen += b
    assert seen == 6


def test_eval_mode_no_aug_deterministic(corpus):
    root, _ = corpus
    cfg = AVSRDatasetConfig(manifest_dir=root, subset="test", length_buckets=(32, 48, 64))
    ds = AVSRDataset(cfg)
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["video"], b["video"])


def test_wer_and_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], [1, 2]) == 2
    w, errs, words = wer(["the cat sat"], ["the cat sat"])
    assert w == 0 and errs == 0 and words == 3
    w, errs, words = wer(["the cat sit down"], ["the cat sat"])
    assert errs == 2 and words == 3
    assert abs(w - 200.0 / 3) < 1e-9
    assert cer(["abc"], ["abd"]) == pytest.approx(100.0 / 3)


def test_shard_batches_aligned():
    from multimodalvc_tpu.data.batching import shard_batches

    batches = [np.asarray([i]) for i in range(10)]
    shards = [shard_batches(batches, 4, s) for s in range(4)]
    # equal step counts across shards (collectives stay aligned)
    assert len({len(s) for s in shards}) == 1
    # the real batches are disjoint across shards
    firsts = [int(b[0]) for s in shards for b in s[: len(batches) // 4]]
    assert len(set(firsts)) == len(firsts)
    assert shard_batches(batches, 1, 0) == batches


def test_pack_token_blocks_modes():
    """pack_token_blocks vs fairseq's _get_slice_indices_fast semantics
    (fairseq/fairseq/data/token_block_utils_fast.pyx:52-106), oracle =
    independently hand-derived block lists."""
    from multimodalvc_tpu.data.batching import block_to_dataset_index, pack_token_blocks

    sizes = [3, 5, 2, 7, 1, 4]  # total 22

    # none: fixed windows over the concatenated stream
    got = pack_token_blocks(sizes, 8, None)
    np.testing.assert_array_equal(got, [[0, 8], [8, 16], [16, 22]])

    # eos: one block per sentence
    got = pack_token_blocks(sizes, 8, "eos")
    np.testing.assert_array_equal(
        got, [[0, 3], [3, 8], [8, 10], [10, 17], [17, 18], [18, 22]]
    )

    # complete: greedy whole sentences; oversized sentences get own block
    # (the 1-token sentence packs with the preceding 7: 7 + 1 = 8 <= 8)
    got = pack_token_blocks(sizes, 8, "complete")
    np.testing.assert_array_equal(got, [[0, 8], [8, 10], [10, 18], [18, 22]])

    # complete_doc: sep (len==1) splits documents, single-token blocks drop
    got = pack_token_blocks([3, 2, 1, 7, 1, 1, 4], 8, "complete_doc", 1)
    np.testing.assert_array_equal(got, [[0, 5], [6, 13], [15, 19]])

    # block -> dataset index mapping (DatasetSearcher analog)
    idx = block_to_dataset_index(sizes, np.asarray([[0, 8], [8, 10], [10, 18], [18, 22]]))
    np.testing.assert_array_equal(
        idx, [[0, 0, 1], [2, 0, 2], [3, 0, 4], [5, 0, 5]]
    )
    # 'none' mode blocks straddling sentences
    idx = block_to_dataset_index(sizes, np.asarray([[5, 13], [13, 22]]))
    np.testing.assert_array_equal(idx, [[1, 2, 3], [3, 3, 5]])


def test_pack_token_blocks_native_matches_python(rng):
    """C++ fast path == python fallback on random size streams."""
    from multimodalvc_tpu import native
    from multimodalvc_tpu.data.batching import pack_token_blocks

    if native._load() is None:
        pytest.skip("native unavailable")
    for trial in range(5):
        sizes = rng.integers(1, 12, 200).astype(np.int64)
        fast = native.token_blocks_complete(sizes, 16, trial % 2 == 1, 1)
        # force the python fallback
        lib, native._lib = native._lib, None
        failed, native._build_failed = native._build_failed, True
        try:
            slow = native.token_blocks_complete(sizes, 16, trial % 2 == 1, 1)
        finally:
            native._lib, native._build_failed = lib, failed
        np.testing.assert_array_equal(fast, slow)
