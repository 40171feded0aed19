"""Beam-search candidate top-2K as a Pallas kernel.

Each decode step takes top-2K over the [B, K*V] candidate row
(live_scores + log_softmax(logits)).  XLA's TopK custom call measured
3.9 ms/step at [48, 641280] f32 — ~25x the HBM roofline of the single
123 MB read it needs (r3 decode trace) — and additionally forces the
[B, K*V] candidate tensor to materialise.

Two entry points share one kernel:

- ``beam_topk_from_logits`` (the serving path) reads the RAW unembed
  logits plus per-row max / logsumexp / beam-score scalars and applies
  ``((x - m) - logS) + score`` inside the kernel — exactly
  ``scores + jax.nn.log_softmax(logits)`` with XLA's op order, so values
  stay bit-identical to the unfused path.  This removes the materialised
  f32 [240, V] log-prob tensor (its fused subtract measured 0.37 ms/step
  in the r5 trace); the [B*K, V] -> [B, K, V] re-tiling reshape remains
  (see the NEGATIVE RESULT in the function docstring).
- ``beam_topk`` keeps the original [B, K, V] log-prob contract (used by
  the ngram-blocked path and the unit tests); it passes zero max/logsumexp
  so the kernel math degenerates to ``logp + score`` bit-exactly.

Structure: the kernel fuses the normalise+add and extracts a
per-column-block top-n (n max-extraction passes over a VMEM block); the
global top-n is then a tiny multi-key sort over the [B, nblocks*n] block
winners.  Exact whenever n <= block columns (every global winner wins its
own block), with lax.top_k's value-desc / index-asc tie order reproduced
end to end: per-block extraction breaks ties on the lowest flat index,
and the merge sorts block winners by (value desc, flat index asc) —
block-major order alone is NOT flat-index order across column blocks, so
a plain lax.top_k over the concatenated winners would break cross-block
ties wrongly (r3 ADVICE).

Inputs are clamped to > NEG_INF on entry, so rows containing -inf (e.g. a
caller masking with -inf) cannot resurrect already-extracted elements;
the clamp means returned *values* saturate at the clamp rather than -inf
for such masked entries — indices (what beam search consumes) are exact.

NEGATIVE RESULTS kept on record (r3):
- a two-stage *XLA* block top-k was ~5.7 ms/step SLOWER than the native
  TopK (the win needs VMEM residency + the fused add, not blocking);
- a whole-row variant (grid (B,), [K, V] resident in VMEM, 2K unrolled
  or fori extraction passes) compiles standalone up to B=16 but the
  remote TPU compile helper rejects the program at serving batch sizes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -3.0e38  # below any f32 logprob sum; must survive f32 exactly
_CLAMP = -2.9e38  # inputs clamped here: strictly above the knock-out sentinel


def _block_topk_kernel(
    logits_ref,  # VMEM [1, k, v_blk] raw logits (or log-probs when m=ls=0)
    m_ref,  # VMEM [1, k, 1] per-row max
    ls_ref,  # VMEM [1, k, 1] per-row log-sum-exp of (x - m)
    score_ref,  # VMEM [1, k, 1] per-row beam score
    vals_ref,  # VMEM [1, 1, 1, n_pad]
    idx_ref,  # VMEM [1, 1, 1, n_pad]
    *,
    n: int,
    k: int,
    v: int,
    v_blk: int,
    n_pad: int,
):
    vb = pl.program_id(1)
    x = logits_ref[0].astype(jnp.float32)
    # identical op order to `scores + jax.nn.log_softmax(logits)`:
    # shifted = x - max; logp = shifted - logS; cand = logp + score
    x = ((x - m_ref[0]) - ls_ref[0]) + score_ref[0]
    x = jnp.maximum(x, _CLAMP)  # -inf inputs must stay above the sentinel
    # FLAT candidate index (row-major over [K, V]) of each element in this
    # column block — ties must break on the global flat index
    col0 = vb * v_blk
    flat_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (k, v_blk), 0) * v
        + jax.lax.broadcasted_iota(jnp.int32, (k, v_blk), 1)
        + col0
    )
    big = jnp.int32(2147483647)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    vals_vec = jnp.full((1, n_pad), NEG_INF, jnp.float32)
    idx_vec = jnp.zeros((1, n_pad), jnp.int32)
    for j in range(n):
        m = jnp.max(x)
        sel = jnp.min(jnp.where(x == m, flat_iota, big))
        vals_vec = jnp.where(lane == j, m, vals_vec)
        idx_vec = jnp.where(lane == j, sel, idx_vec)
        x = jnp.where(flat_iota == sel, NEG_INF, x)
    vals_ref[0, 0] = vals_vec
    idx_ref[0, 0] = idx_vec


def _pick_block(v: int, target: int = 24576) -> int:
    """Largest 128-multiple divisor of v that is <= target (v is a multiple
    of 128 for real vocabs; fall back to the full row otherwise)."""
    if v % 128:
        return v
    best = v
    for nb in range(1, v // 128 + 1):
        if v % nb == 0 and (v // nb) % 128 == 0:
            blk = v // nb
            if blk <= target:
                return blk
            best = blk
    return best


def _run_and_merge(logits3d, m, ls, bias, n, interpret):
    """Shared pallas_call + cross-block winner merge.  All inputs 3D:
    logits [B, K, V]; m/ls/bias [B, K, 1]."""
    b, k, v = logits3d.shape
    v_blk = _pick_block(v)
    nblocks = v // v_blk
    n_pad = max(-(-n // 128) * 128, 128)
    kernel = functools.partial(
        _block_topk_kernel, n=n, k=k, v=v, v_blk=v_blk, n_pad=n_pad
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=(b, nblocks),
        in_specs=[
            pl.BlockSpec((1, k, v_blk), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, k, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, k, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, k, 1), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, n_pad), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, n_pad), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nblocks, 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, nblocks, 1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(logits3d, m, ls, bias)
    # merge block winners with a lexicographic (value desc, flat index asc)
    # sort — matches lax.top_k's tie order even when equal values straddle
    # column blocks (flat index is NOT monotone in block-major order: block 0
    # holds row 1's small columns at flat index >= V while block 1 holds row
    # 0's later columns at flat index < V).  nblocks*n is tiny (~60).
    cand_v = vals[:, :, 0, :n].reshape(b, nblocks * n)
    cand_i = idx[:, :, 0, :n].reshape(b, nblocks * n)
    _, top_i, top_v = jax.lax.sort(
        (-cand_v, cand_i, cand_v), dimension=1, num_keys=2
    )
    return top_v[:, :n], top_i[:, :n]


def beam_topk_from_logits(
    logits: jnp.ndarray,  # [B*K, V] RAW logits straight from the unembed
    row_max: jnp.ndarray,  # [B*K] or [B*K, 1] f32 per-row max(logits)
    row_logsumexp: jnp.ndarray,  # [B*K] or [B*K, 1] f32 log(sum(exp(x - max)))
    scores: jnp.ndarray,  # [B, K] f32 running beam scores
    n: int,
    interpret=None,
):
    """(values [B, n] f32, flat_indices [B, n] int32) of
    ``(scores[:, :, None] + log_softmax(logits).reshape(B, K, V))
    .reshape(B, K*V)`` — the log-softmax normalise happens INSIDE the
    kernel (in XLA's op order), so the [B*K, V] f32 log-prob tensor is
    never materialised (its fused subtract measured 0.37 ms/step at
    batch 48 in the r5 trace).

    NEGATIVE RESULT (r5, v5e): a 2D [B*K, V] input (which would also skip
    the [B*K,V]->[B,K,V] re-tiling reshape, 0.71 ms/step) is blocked by
    Mosaic's (8,128) trailing-block rule for K=5 row groups, and the
    8-groups-per-block workaround (block (40, v_blk), 8x10 unrolled
    extraction passes) hung the remote TPU compile helper (>580 s) —
    keep the proven [1, K, v_blk] block structure."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k = scores.shape
    r, v = logits.shape
    assert r == b * k, (logits.shape, scores.shape)
    m = row_max.reshape(b, k, 1).astype(jnp.float32)
    ls = row_logsumexp.reshape(b, k, 1).astype(jnp.float32)
    bias = scores.reshape(b, k, 1).astype(jnp.float32)
    return _run_and_merge(logits.reshape(b, k, v), m, ls, bias, n, interpret)


def _column_champion_kernel(
    logits_ref,  # VMEM [1, k, 8, vq] raw logits (V folded to (8, vq) lanes)
    m_ref,  # VMEM [1, k, 1, 1]
    ls_ref,  # VMEM [1, k, 1, 1]
    score_ref,  # VMEM [1, k, 1, 1]
    flats_ref,  # VMEM [1, 1, n_pad] int32 champion flat indices
    *,
    n: int,
    k: int,
    vq: int,
    n_pad: int,
):
    x = logits_ref[0].astype(jnp.float32)  # [k, 8, vq]
    # identical op order to `scores + jax.nn.log_softmax(logits)`
    x = ((x - m_ref[0]) - ls_ref[0]) + score_ref[0]
    x = jnp.maximum(x, _CLAMP)
    v = 8 * vq
    # global column id of lane (s, l) after the [V] -> [8, vq] fold
    colg = (
        jax.lax.broadcasted_iota(jnp.int32, (8, vq), 0) * vq
        + jax.lax.broadcasted_iota(jnp.int32, (8, vq), 1)
    )
    # per-column champion over the k beam rows; strict > keeps the lowest
    # row (= lowest flat index) on ties, matching lax.top_k's tie order
    best_v = x[0]
    best_f = colg  # row 0: flat = 0*V + col
    for r in range(1, k):
        xr = x[r]
        take = xr > best_v
        best_v = jnp.where(take, xr, best_v)
        best_f = jnp.where(take, colg + r * v, best_f)
    # n extraction passes with whole-COLUMN knockout: yields the top-n
    # distinct-column champions.  The true top-n of the [k, V] block lives
    # inside those n columns: if a rank-t-in-its-column element is in the
    # global top-n, every lower-rank element of that column is too — in
    # particular the column's champion — so the column is a top-n champion
    # column.  The caller gathers all k rows of the n columns and merges.
    big = jnp.int32(2147483647)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    flats_vec = jnp.zeros((1, n_pad), jnp.int32)
    for j in range(n):
        mj = jnp.max(best_v)
        sel = jnp.min(jnp.where(best_v == mj, best_f, big))
        flats_vec = jnp.where(lane == j, sel, flats_vec)
        best_v = jnp.where(best_f == sel, NEG_INF, best_v)
    flats_ref[0] = flats_vec


def beam_topk_columns(
    logits: jnp.ndarray,  # [B*K, V] RAW logits straight from the unembed
    row_max: jnp.ndarray,  # [B*K] or [B*K, 1] f32 per-row max(logits)
    row_logsumexp: jnp.ndarray,  # [B*K] or [B*K, 1] f32 log(sum(exp(x - max)))
    scores: jnp.ndarray,  # [B, K] f32 running beam scores
    n: int,
    interpret=None,
):
    """Column-champion variant of ``beam_topk_from_logits`` — same contract
    (values clamp-saturate at the knock-out sentinel; indices exact).

    Instead of n max-extraction passes over the whole padded [K(->8), V]
    block (r5 trace: 2.15 ms/step, ~9x the read roofline, VPU-bound), the
    kernel folds V into the 8 sublanes ([B, K, 8, V/8] — a 123 MB dense
    re-tiling, vs 197 MB for the 5->8 padded [B, K, V] form), reduces the
    K beam rows to one per-column champion ([8, V/8], zero padding), and
    runs the n extraction passes on that 5x-smaller array with whole-column
    knockout.  The caller gathers all K rows of the n champion columns
    (K*n values — the provable superset of the true top-n) and does an
    exact (value desc, flat asc) merge in XLA."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k = scores.shape
    r, v = logits.shape
    assert r == b * k and v % 8 == 0, (logits.shape, scores.shape)
    vq = v // 8
    n_pad = max(-(-n // 128) * 128, 128)
    x4 = logits.reshape(b, k, 8, vq)
    m = row_max.reshape(b, k, 1, 1).astype(jnp.float32)
    ls = row_logsumexp.reshape(b, k, 1, 1).astype(jnp.float32)
    bias = scores.reshape(b, k, 1, 1).astype(jnp.float32)
    kernel = functools.partial(
        _column_champion_kernel, n=n, k=k, vq=vq, n_pad=n_pad
    )
    flats = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 8, vq), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, k, 1, 1), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, k, 1, 1), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, k, 1, 1), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, n_pad), jnp.int32),
        interpret=interpret,
    )(x4, m, ls, bias)
    cols = flats[:, 0, :n] % v  # [B, n] champion columns (distinct per batch)
    # gather ALL k beam rows at the champion columns and re-derive the
    # candidate values with the same f32 op order (bit-identical to the
    # kernel's, so selection and merge can never disagree)
    cols_bk = jnp.broadcast_to(cols[:, None, :], (b, k, n)).reshape(r, n)
    cand = jnp.take_along_axis(logits, cols_bk, axis=1)  # [B*K, n]
    cand_v = (
        (cand.astype(jnp.float32) - row_max.reshape(r, 1).astype(jnp.float32))
        - row_logsumexp.reshape(r, 1).astype(jnp.float32)
    ) + scores.reshape(r, 1).astype(jnp.float32)
    cand_v = jnp.maximum(cand_v, _CLAMP)
    row_in_batch = (jnp.arange(r, dtype=jnp.int32) % k)[:, None]
    cand_f = row_in_batch * v + cols_bk
    cv = cand_v.reshape(b, k * n)
    cf = cand_f.reshape(b, k * n)
    _, top_f, top_v = jax.lax.sort((-cv, cf, cv), dimension=1, num_keys=2)
    return top_v[:, :n], top_f[:, :n]


def beam_topk(
    logp: jnp.ndarray,  # [B, K, V] f32/bf16 log-probs (+ any penalties)
    scores: jnp.ndarray,  # [B, K] f32 running beam scores
    n: int,
    interpret=None,
):
    """(values [B, n] f32, flat_indices [B, n] int32) of
    ``(scores[:, :, None] + logp).reshape(B, K*V)`` — drop-in for
    ``jax.lax.top_k`` on the beam-candidate row, without materialising it.
    Zero max/logsumexp degenerate the kernel math to ``logp + score``
    bit-exactly (x - 0.0 - 0.0 is exact in f32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k, v = logp.shape
    zeros = jnp.zeros((b, k, 1), jnp.float32)
    return _run_and_merge(
        logp, zeros, zeros, scores.reshape(b, k, 1), n, interpret
    )
