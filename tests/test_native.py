"""Native C++ ops vs Python references."""
import numpy as np
import pytest

from multimodalvc_tpu import native
from multimodalvc_tpu.utils.wer import _edit_distance_dp


@pytest.fixture(scope="module")
def lib():
    lib = native._load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_native_edit_distance(lib, rng):
    for _ in range(20):
        a = rng.integers(0, 5, rng.integers(0, 30)).tolist()
        b = rng.integers(0, 5, rng.integers(0, 30)).tolist()
        got = native.edit_distance_native([str(x) for x in a], [str(x) for x in b])
        assert got == _edit_distance_dp(a, b)


def test_native_batch_by_size(lib):
    sizes = np.asarray([30, 45, 60, 30, 45, 60, 31])
    order = np.argsort(sizes, kind="stable")
    batches = native.batch_by_size_native(sizes, order, [32, 48, 64], 200, 0, 1)
    covered = sorted(int(i) for b in batches for i in b)
    assert covered == list(range(7))
    for b in batches:
        bucket = max(min(bk for bk in (32, 48, 64) if sizes[int(i)] <= bk) for i in b)
        assert len(b) * bucket <= 200


def test_balanced_assignment_balance_and_quality(lib, rng):
    n_workers, n_jobs = 4, 32
    scores = rng.standard_normal((n_workers, n_jobs)).astype(np.float32)
    out = native.balanced_assignment(scores)
    counts = np.bincount(out, minlength=n_workers)
    assert (counts == n_jobs // n_workers).all()
    # quality: at least as good as the greedy fallback
    total = scores[out, np.arange(n_jobs)].sum()
    greedy = native._balanced_assignment_py(scores)
    greedy_total = scores[greedy, np.arange(n_jobs)].sum()
    assert total >= greedy_total - 1e-3


def test_ngram_banned_tokens(lib):
    tokens = np.asarray([[1, 2, 3, 1, 2, 4, 1, 2], [5, 5, 5, 5, 5, 5, 5, 5]])
    bans = native.ngram_banned_tokens(tokens, ngram=3)
    # row 0 suffix (1,2): bigram (1,2) appeared at 0->3 and 3->4
    assert sorted(bans[0]) == [3, 4]
    assert set(bans[1]) == {5}
    # python fallback agrees
    lib_bans = bans
    native._lib, saved = None, native._lib
    native._build_failed = True
    try:
        py_bans = native.ngram_banned_tokens(tokens, ngram=3)
    finally:
        native._lib, native._build_failed = saved, False
    assert [sorted(b) for b in py_bans] == [sorted(b) for b in lib_bans]


def test_bleu_counts_native_matches_fallback(lib, rng):
    for _ in range(10):
        s = rng.integers(0, 6, rng.integers(1, 25)).tolist()
        r = rng.integers(0, 6, rng.integers(1, 25)).tolist()
        m, t = native.bleu_counts(s, r)
        native._lib, saved = None, native._lib
        native._build_failed = True
        try:
            m2, t2 = native.bleu_counts(s, r)
        finally:
            native._lib, native._build_failed = saved, False
        np.testing.assert_array_equal(m, m2)
        np.testing.assert_array_equal(t, t2)


def test_bleu_scorer(lib):
    sc = native.BleuScorer()
    sc.add([1, 2, 3, 4, 5], [1, 2, 3, 4, 5])
    assert abs(sc.score() - 100.0) < 1e-6
    sc.add([9, 9, 9, 9], [1, 2, 3, 4])
    assert 0.0 < sc.score() < 100.0
    empty = native.BleuScorer()
    assert empty.score() == 0.0
