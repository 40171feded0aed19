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
