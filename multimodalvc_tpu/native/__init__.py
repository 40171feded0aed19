"""ctypes bindings for the C++ host-side ops, built lazily with make.

Native-equivalents of the reference's compiled layer (SURVEY.md §2.4):
libnat edit distance, Cython batch_by_size, libbase balanced assignment,
and the n-gram repeat block.  Python fallbacks exist everywhere; these are
the fast paths for large corpora / decode batches.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmmvc_native.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    # Always invoke make: its timestamp check rebuilds the .so whenever any
    # .cpp source is newer, so edits never silently load a stale binary.
    try:
        subprocess.run(
            ["make", "-s"], cwd=_DIR, check=True, capture_output=True, timeout=120
        )
    except Exception as e:  # no compiler / sandbox
        if not os.path.exists(_LIB_PATH):
            logger.info("native build unavailable (%s); using Python fallbacks", e)
            _build_failed = True
            return None
        logger.info("native rebuild failed (%s); loading existing binary", e)
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.info("native load failed (%s)", e)
        _build_failed = True
        return None
    lib.mmvc_edit_distance_i32.restype = ctypes.c_int64
    lib.mmvc_edit_distance_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.mmvc_edit_distance_batch.restype = ctypes.c_int64
    lib.mmvc_batch_by_size.restype = ctypes.c_int64
    if hasattr(lib, "mmvc_bleu_counts"):
        lib.mmvc_bleu_counts.restype = None
    if hasattr(lib, "mmvc_token_blocks_complete"):
        lib.mmvc_token_blocks_complete.restype = ctypes.c_int64
    _lib = lib
    return lib


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def edit_distance_native(a: Sequence, b: Sequence) -> int:
    """Edit distance over hashable items (words) via an id mapping."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native unavailable")
    vocab = {}
    enc = lambda seq: np.asarray(
        [vocab.setdefault(x, len(vocab)) for x in seq], dtype=np.int32
    )
    ea, eb = enc(a), enc(b)
    return int(
        lib.mmvc_edit_distance_i32(_i32ptr(ea), len(ea), _i32ptr(eb), len(eb))
    )


def batch_by_size_native(
    sizes: np.ndarray,
    order: np.ndarray,
    buckets: List[int],
    max_tokens: int,
    batch_size: int,
    required_multiple: int,
) -> Optional[List[np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    sizes64 = np.ascontiguousarray(sizes, dtype=np.int64)
    order64 = np.ascontiguousarray(order, dtype=np.int64)
    buckets64 = np.ascontiguousarray(buckets, dtype=np.int64)
    out = np.empty(len(order64), dtype=np.int32)
    n_batches = lib.mmvc_batch_by_size(
        _i64ptr(sizes64),
        _i64ptr(order64),
        ctypes.c_int64(len(order64)),
        _i64ptr(buckets64),
        ctypes.c_int64(len(buckets64)),
        ctypes.c_int64(max_tokens),
        ctypes.c_int64(batch_size),
        ctypes.c_int64(required_multiple),
        _i32ptr(out),
    )
    # remainder carry happens inside the C++ loop (fairseq semantics);
    # every index appears in exactly one batch.
    batches: List[List[int]] = [[] for _ in range(int(n_batches))]
    for pos, bid in enumerate(out):
        batches[int(bid)].append(int(order64[pos]))
    return [np.asarray(blist) for blist in batches]


def token_blocks_complete(
    sizes: np.ndarray,
    block_size: int,
    complete_doc: bool = False,
    document_sep_len: int = 1,
) -> np.ndarray:
    """Greedy whole-sentence block packing (fairseq 'complete'/'complete_doc'
    break modes, token_block_utils_fast.pyx:66-97).  C++ fast path with a
    pure-python fallback."""
    sizes64 = np.ascontiguousarray(sizes, dtype=np.int64)
    n = len(sizes64)
    lib = _load()
    if lib is not None and hasattr(lib, "mmvc_token_blocks_complete"):
        out = np.empty((max(n, 1), 2), dtype=np.int64)
        nb = lib.mmvc_token_blocks_complete(
            _i64ptr(sizes64),
            ctypes.c_int64(n),
            ctypes.c_int64(block_size),
            ctypes.c_int64(1 if complete_doc else 0),
            ctypes.c_int64(document_sep_len),
            _i64ptr(out),
        )
        return out[: int(nb)].copy()
    blocks = []
    tok_idx = curr = i = 0
    min_keep = 1 if complete_doc else 0
    while i < n:
        is_sep = complete_doc and sizes64[i] == document_sep_len
        if (curr + sizes64[i] <= block_size or curr == 0) and not is_sep:
            curr += int(sizes64[i])
            i += 1
        else:
            if curr > min_keep:
                blocks.append((tok_idx, tok_idx + curr))
            tok_idx += curr
            curr = 0
            if is_sep:
                tok_idx += int(sizes64[i])
                i += 1
    if curr > min_keep:
        blocks.append((tok_idx, tok_idx + curr))
    return np.asarray(blocks, np.int64).reshape(-1, 2)


def balanced_assignment(scores: np.ndarray) -> np.ndarray:
    """scores: [n_workers, n_jobs] -> worker id per job (balanced)."""
    lib = _load()
    n_workers, n_jobs = scores.shape
    if lib is None:
        return _balanced_assignment_py(scores)
    s = np.ascontiguousarray(scores, dtype=np.float32)
    out = np.empty(n_jobs, dtype=np.int32)
    lib.mmvc_balanced_assignment(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_workers),
        ctypes.c_int64(n_jobs),
        _i32ptr(out),
    )
    return out


def _balanced_assignment_py(scores: np.ndarray) -> np.ndarray:
    """Greedy fallback: sort all (worker, job) pairs by score, fill capacity."""
    n_workers, n_jobs = scores.shape
    cap = n_jobs // n_workers
    order = np.argsort(-scores, axis=None)
    assigned = np.full(n_jobs, -1, dtype=np.int32)
    load = np.zeros(n_workers, dtype=np.int64)
    for flat in order:
        w, j = divmod(int(flat), n_jobs)
        if assigned[j] == -1 and load[w] < cap:
            assigned[j] = w
            load[w] += 1
    # any leftovers -> least loaded
    for j in np.where(assigned == -1)[0]:
        w = int(np.argmin(load))
        assigned[j] = w
        load[w] += 1
    return assigned


def bleu_counts(
    sys_ids: Sequence[int], ref_ids: Sequence[int], max_order: int = 4
) -> tuple:
    """Clipped n-gram (matches, totals) per order for one sentence pair.
    Native-equivalent of the reference's libbleu counter
    (fairseq/fairseq/clib/libbleu/libbleu.cpp)."""
    s = np.ascontiguousarray(sys_ids, dtype=np.int32)
    r = np.ascontiguousarray(ref_ids, dtype=np.int32)
    lib = _load()
    if lib is not None:
        matches = np.zeros(max_order, dtype=np.int64)
        totals = np.zeros(max_order, dtype=np.int64)
        lib.mmvc_bleu_counts(
            _i32ptr(s), ctypes.c_int64(len(s)),
            _i32ptr(r), ctypes.c_int64(len(r)),
            ctypes.c_int64(max_order),
            _i64ptr(matches), _i64ptr(totals),
        )
        return matches, totals
    # Python fallback
    from collections import Counter

    matches = np.zeros(max_order, dtype=np.int64)
    totals = np.zeros(max_order, dtype=np.int64)
    for n in range(1, max_order + 1):
        sys_ng = [tuple(s[i : i + n]) for i in range(len(s) - n + 1)]
        ref_ng = Counter(tuple(r[i : i + n]) for i in range(len(r) - n + 1))
        totals[n - 1] = len(sys_ng)
        clipped = Counter(sys_ng) & ref_ng
        matches[n - 1] = sum(clipped.values())
    return matches, totals


class BleuScorer:
    """Corpus BLEU accumulator (reference: fairseq/fairseq/scoring/bleu.py
    over libbleu counts)."""

    def __init__(self, max_order: int = 4):
        self.max_order = max_order
        self.matches = np.zeros(max_order, dtype=np.int64)
        self.totals = np.zeros(max_order, dtype=np.int64)
        self.sys_len = 0
        self.ref_len = 0

    def add(self, sys_ids: Sequence[int], ref_ids: Sequence[int]) -> None:
        m, t = bleu_counts(sys_ids, ref_ids, self.max_order)
        self.matches += m
        self.totals += t
        self.sys_len += len(sys_ids)
        self.ref_len += len(ref_ids)

    def score(self) -> float:
        """BLEU-4 in percent with brevity penalty (smoothed against /0)."""
        import math

        if self.sys_len == 0:
            return 0.0
        logs = 0.0
        for m, t in zip(self.matches, self.totals):
            p = m / t if t > 0 else 0.0
            logs += math.log(p) if p > 0 else float("-inf")
        if logs == float("-inf"):
            return 0.0
        bp = min(1.0, math.exp(1.0 - self.ref_len / max(self.sys_len, 1)))
        return 100.0 * bp * math.exp(logs / self.max_order)


def ngram_banned_tokens(tokens: np.ndarray, ngram: int, max_banned: int = 64) -> List[List[int]]:
    """Per-row banned next-tokens under no-repeat-ngram (host-side)."""
    tokens = np.ascontiguousarray(tokens, dtype=np.int32)
    bsz, length = tokens.shape
    lib = _load()
    if lib is not None:
        banned = np.zeros((bsz, max_banned), dtype=np.int32)
        counts = np.zeros(bsz, dtype=np.int32)
        lib.mmvc_ngram_repeat_block(
            _i32ptr(tokens),
            ctypes.c_int64(bsz),
            ctypes.c_int64(length),
            ctypes.c_int64(ngram),
            _i32ptr(banned),
            ctypes.c_int64(max_banned),
            _i32ptr(counts),
        )
        return [banned[i, : counts[i]].tolist() for i in range(bsz)]
    out = []
    k = ngram - 1
    for row in tokens:
        bans = []
        if length >= k and k > 0:
            suffix = row[length - k :]
            for start in range(length - ngram + 1):
                if np.array_equal(row[start : start + k], suffix):
                    bans.append(int(row[start + k]))
        out.append(bans[:max_banned])
    return out
