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
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s"], cwd=_DIR, check=True, capture_output=True, timeout=120
            )
        except Exception as e:  # no compiler / sandbox
            logger.info("native build unavailable (%s); using Python fallbacks", e)
            _build_failed = True
            return None
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
        _i32ptr(out),
    )
    batches: List[List[int]] = [[] for _ in range(int(n_batches))]
    for pos, bid in enumerate(out):
        batches[int(bid)].append(int(order64[pos]))
    result = []
    for blist in batches:
        if required_multiple > 1 and len(blist) >= required_multiple:
            keep = (len(blist) // required_multiple) * required_multiple
            blist = blist[:keep] if keep else blist
        result.append(np.asarray(blist))
    return result


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
