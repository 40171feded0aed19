"""Length-bucketed batch construction.

Reference: fairseq ``batch_by_size`` backed by Cython
(fairseq/fairseq/data/data_utils_fast.pyx) — groups length-sorted indices
under a max-token budget with a batch-size-multiple constraint.  Here the
grouping additionally snaps each batch's pad length to a BUCKET boundary so
XLA compiles exactly ``len(buckets)`` programs (the TPU version of the
reference's dynamic padding).  A C++ fast path (native/batching.cpp) is used
when built; the numpy path is the always-available fallback.
"""
from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def bucket_for(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length (lengths beyond the last bucket clamp)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def batch_by_size(
    sizes: Sequence[int],
    max_tokens: Optional[int] = None,
    batch_size: Optional[int] = None,
    buckets: Sequence[int] = (100, 200, 300, 400, 500),
    required_multiple: int = 1,
    shuffle_seed: Optional[int] = None,
) -> List[np.ndarray]:
    """Group indices into batches of same-bucket samples.

    Cost model matches fairseq: a batch of n samples padded to bucket B costs
    n*B tokens; flush when adding a sample would exceed max_tokens or
    batch_size.  Returns a list of index arrays.
    """
    sizes = np.asarray(sizes)
    order = np.argsort(sizes, kind="stable")
    try:
        from .native import batch_by_size_native

        batches = batch_by_size_native(
            sizes, order, list(buckets), max_tokens or 0, batch_size or 0, required_multiple
        )
        if batches is not None:
            return _shuffled(batches, shuffle_seed)
    except Exception:
        pass

    batches: List[np.ndarray] = []
    cur: List[int] = []
    cur_bucket = 0
    for idx in order:
        b = bucket_for(int(sizes[idx]), buckets)
        new_bucket = max(cur_bucket, b)
        n = len(cur) + 1
        over_tokens = max_tokens is not None and n * new_bucket > max_tokens
        over_batch = batch_size is not None and n > batch_size
        if cur and (over_tokens or over_batch or b != cur_bucket):
            # fairseq remainder carry (data_utils_fast.pyx mod_len): flush the
            # largest required_multiple-aligned prefix; the remainder CARRIES
            # into the next batch — no sample is ever dropped.
            keep = len(cur)
            if required_multiple > 1 and len(cur) >= required_multiple:
                keep = (len(cur) // required_multiple) * required_multiple
            batches.append(np.asarray(cur[:keep]))
            cur = cur[keep:]
            new_bucket = b  # carried items are shorter (sorted order)
        cur.append(int(idx))
        cur_bucket = new_bucket
    if cur:
        batches.append(np.asarray(cur))  # final remainder batch kept whole
    return _shuffled(batches, shuffle_seed)


def _shuffled(batches: List[np.ndarray], seed: Optional[int]) -> List[np.ndarray]:
    if seed is None:
        return batches
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(batches))
    return [batches[i] for i in order]


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Repeat trailing rows so dim 0 of every array is a mesh multiple.

    Data-parallel sharding needs batch % (data*fsdp) == 0; small final /
    remainder batches are padded by repetition (duplicated rows inflate sums
    by <1 batch per epoch; batch_by_size itself never drops samples —
    remainders carry, matching fairseq data_utils_fast.pyx).
    """
    sizes = {v.shape[0] for v in batch.values() if hasattr(v, "ndim") and v.ndim >= 1}
    if not sizes:
        return batch
    b = max(sizes)
    target = -(-b // multiple) * multiple
    if target == b:
        return batch
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == b:
            reps = np.concatenate([np.arange(b), np.full(target - b, b - 1)])
            out[k] = v[reps]
        else:
            out[k] = v
    return out


def pad_to(arr: np.ndarray, length: int, axis: int = 0, value=0) -> np.ndarray:
    """Pad/truncate along one axis to a static length."""
    cur = arr.shape[axis]
    if cur == length:
        return arr
    if cur > length:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, length)
        return arr[tuple(sl)]
    cfg = [(0, 0)] * arr.ndim
    cfg[axis] = (0, length - cur)
    return np.pad(arr, cfg, constant_values=value)


def shard_batches(
    batches: List[np.ndarray], num_shards: int, shard_id: int, fill: bool = True
) -> List[np.ndarray]:
    """Per-process batch sharding for multi-host data parallelism
    (reference analog: fairseq/fairseq/data/iterators.py ShardedIterator —
    each rank takes every num_shards-th batch; with ``fill`` the list is
    padded by wrapping so every shard sees the same number of batches and
    collective-synchronised steps stay aligned)."""
    if not 0 <= shard_id < num_shards:
        raise ValueError(f"shard_id {shard_id} out of range for {num_shards}")
    if num_shards == 1:
        return list(batches)
    mine = batches[shard_id::num_shards]
    if fill:
        n_total = -(-len(batches) // num_shards)
        i = 0
        while len(mine) < n_total and batches:
            mine.append(batches[i % len(batches)])
            i += 1
    return mine


def pack_token_blocks(
    sizes: Sequence[int],
    block_size: int,
    break_mode: Optional[str] = None,
    document_sep_len: int = 1,
) -> np.ndarray:
    """Slice a concatenated token stream into LM training blocks.

    Analog of fairseq's Cython ``_get_slice_indices_fast``
    (fairseq/fairseq/data/token_block_utils_fast.pyx:52-106) used by
    TokenBlockDataset.  Returns [N, 2] int64 (start, end) offsets into the
    flattened stream.  Break modes:

    - None/'none': fixed ``block_size`` windows, ignoring sentence bounds
    - 'complete': greedy whole-sentence packing up to ``block_size`` (a
      sentence longer than the block gets its own oversized block)
    - 'complete_doc': like 'complete' but never packs across documents
      (a sentence of exactly ``document_sep_len`` tokens separates docs);
      single-token blocks are dropped
    - 'eos': one block per sentence
    """
    sizes = np.asarray(sizes, np.int64)
    if break_mode is None or break_mode == "none":
        total = int(sizes.sum())
        starts = np.arange(0, total, block_size, dtype=np.int64)
        ends = np.minimum(starts + block_size, total)
        return np.stack([starts, ends], axis=1)
    if break_mode == "eos":
        cum = sizes.cumsum()
        out = np.zeros((len(sizes), 2), np.int64)
        out[1:, 0] = cum[:-1]
        out[:, 1] = cum
        return out
    if break_mode not in ("complete", "complete_doc"):
        raise ValueError(f"Invalid break_mode: {break_mode}")
    from ..native import token_blocks_complete

    return token_blocks_complete(
        sizes, block_size, break_mode == "complete_doc", document_sep_len
    )


def block_to_dataset_index(
    sizes: Sequence[int], slice_indices: np.ndarray
) -> np.ndarray:
    """Map each (start, end) block to (start_ds_idx, start_offset,
    end_ds_idx) in the underlying per-sentence dataset
    (token_block_utils_fast.pyx:109-139 DatasetSearcher)."""
    sizes = np.asarray(sizes, np.int64)
    cum = np.concatenate([[0], sizes.cumsum()])
    out = np.zeros((len(slice_indices), 3), np.int64)
    s = slice_indices[:, 0]
    e = np.maximum(slice_indices[:, 1], s + 1)  # e <= s degenerates to start
    start_idx = np.searchsorted(cum, s, side="right") - 1
    end_idx = np.searchsorted(cum, e - 1, side="right") - 1
    out[:, 0] = start_idx
    out[:, 1] = s - cum[start_idx]
    out[:, 2] = np.where(slice_indices[:, 1] <= s, start_idx, end_idx)
    return out
