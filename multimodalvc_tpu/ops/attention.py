"""Attention primitives: XLA reference path + Pallas flash-attention kernel.

The reference runs torch ``MultiheadAttention``/HF attention everywhere
(e.g. avhubert/hubert.py 24-layer encoder, src/sub_model/Qformer.py,
HF LLaMA).  On TPU the hot path is a flash-style Pallas kernel: online
softmax over key blocks so the [Tq, Tk] score matrix never materialises in
HBM, fp32 accumulation, MXU matmuls.  The XLA einsum path is kept as the
numerically-transparent fallback (and for cross-attention shapes the kernel
does not cover).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention. q: [B,H,Tq,D], k/v: [B,H,Tk,D].

    mask: broadcastable to [B,H,Tq,Tk]; True = attend. bias: additive,
    broadcastable to [B,H,Tq,Tk].  Softmax in fp32 regardless of input dtype.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if causal:
        tq, tk = scores.shape[-2:]
        cmask = jnp.tril(jnp.ones((tq, tk), dtype=bool), k=tk - tq)
        scores = jnp.where(cmask, scores, NEG_INF)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------


def _flash_kernel(
    kv_len_ref,  # SMEM [B] int32 (scalar-prefetch) — valid kv length per row
    kv_start_ref,  # SMEM [B] int32 — first valid kv slot per row (left pad)
    q_ref,  # VMEM [1, block_q, d]
    k_ref,  # VMEM [1, block_k, d]
    v_ref,  # VMEM [1, block_k, d]
    o_ref,  # VMEM [1, block_q, d]
    m_scr,  # VMEM [block_q, 128] running max
    l_scr,  # VMEM [block_q, 128] running denom
    acc_scr,  # VMEM [block_q, d] fp32 accumulator
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
):
    kb = pl.program_id(3)
    n_kb = pl.num_programs(3)
    qb = pl.program_id(2)
    single_kb = pl.num_programs(3) == 1  # static: grid is Python-known

    if not single_kb:
        @pl.when(kb == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, NEG_INF)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

    kv_len = kv_len_ref[pl.program_id(0)]
    kv_start = kv_start_ref[pl.program_id(0)]
    k_start = kb * block_k

    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale
        col = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = jnp.logical_and(col >= kv_start, col < kv_len)
        if causal:
            row = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            valid = jnp.logical_and(valid, col <= row)
        s = jnp.where(valid, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        if single_kb:
            # one kv block: no running state to merge.  The cross-block
            # rescale is not just extra VPU work — reading m/l/acc scratch
            # written by the previous kv iteration serializes the grid
            # pipeline (measured 12.6 -> 6.9 ms on [32,16,1536,64] at
            # block_k=512 when the dependency is removed), so the block
            # chooser below prefers a single kv block whenever it fits VMEM.
            # Fully-masked rows (m_cur == NEG_INF) zero p so they emit exact
            # zeros from _finish (multi-block gets this from the skipped-init
            # path instead).
            any_valid = m_cur > (0.5 * NEG_INF)
            p = jnp.where(any_valid, jnp.exp(s - m_cur), 0.0)
            l_new = jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[...] = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
        else:
            m_prev = m_scr[:, :1]
            m_new = jnp.maximum(m_prev, m_cur)
            # same fully-masked-row guard as the single-block path: when every
            # column seen so far is masked, s == m_new == NEG_INF and
            # exp(s - m_new) would be exp(0) = 1 per masked column — the row
            # would emit mean(V) instead of the contract's exact zeros.
            # (Caught by the on-TPU tier; interpret suites only exercised
            # single-kv-block shapes for the left-pad window.)
            p = jnp.where(m_new > (0.5 * NEG_INF), jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
            l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    if single_kb:
        # the single block always runs (the skip could only fire for a fully
        # padded row, which the any_valid guard in _body already zeroes)
        _body()
    else:
        # skip key blocks entirely left of the pad window; for causal also
        # skip blocks fully above the diagonal
        live = k_start + block_k > kv_start
        if causal:
            live = jnp.logical_and(live, k_start <= (qb + 1) * block_q - 1)
        pl.when(live)(_body)

    @pl.when(kb == n_kb - 1)
    def _finish():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    kv_starts: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flash attention. q: [B,H,Tq,D], k/v: [B,H,Tk,D], kv_lens: [B] int32.

    Tq/Tk are padded internally to block multiples; padded keys are masked by
    kv_lens (defaults to full Tk).  kv_starts [B] masks a left-pad prefix so
    the valid window is [kv_starts, kv_lens) — this is how LLaMA's left-padded
    prompt assembly (models/avsr.py assemble_left_padded) folds into the
    kernel.  Head dim should be a multiple of 128 for peak MXU efficiency but
    any size compiles.  interpret=None auto-enables interpreter mode off-TPU.

    Differentiable: ``jax.grad`` through this function uses a custom VJP whose
    backward recomputes attention on the XLA reference path (a [Tq, Tk] score
    transient exists only inside the backward pass, at training lengths this
    is cheap; the forward never materialises it).

    block_q/block_k default to a shape-based choice (v5e sweep, bench.py
    history): long low-head-dim encoder sequences want big 768x768 blocks
    (1.73 ms vs 2.89 at 512x512 vs 12.2 at 128x128 for Whisper's
    [8,16,1500,64], and 768 divides the 1536-padded length exactly); short
    or 128-wide sequences keep 128x128 (larger blocks lose to padding waste
    at LLaMA's [8,24,210,128] prefill).
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if block_q is None or block_k is None:
        tk_p = -(-tk // 128) * 128
        if d <= 64 and tq >= 384 and tk_p <= 1536:
            # SINGLE kv block: the whole key range in one block drops the
            # cross-block online-softmax rescale, whose scratch read-after-
            # write serializes the grid pipeline (v5e, batch 32: Whisper
            # [32,16,1536,64] 8.68 -> 6.52 ms, AV-HuBERT [32,16,512,64]
            # 4.15 -> 2.09 ms).  VMEM at the 768x1536 worst case is ~8.6 MB
            # of the ~16 MB budget.
            auto_k = tk_p
            auto_q = min(768, -(-tq // 128) * 128)
        elif d <= 64 and tq >= 1024:
            # prefer 768 unless it pads worse than 512 (768 wins at equal
            # padding, e.g. 1500 -> 1536 either way; 512 wins at 1024/2048)
            pad768 = -(-tq // 768) * 768
            pad512 = -(-tq // 512) * 512
            auto_q = auto_k = 768 if pad768 <= pad512 else 512
        elif d <= 64 and tq >= 384:
            auto_q, auto_k = 256, 256
        elif d <= 128 and tq >= 384 and tk_p <= 1536:
            # d=128 (LLaMA prefill): the same single-kv-block schedule wins
            # once the work amortizes the kernel entry — r5 v5e A/B vs XLA
            # fused attention (causal, 24 heads): [4,1024] 1.65 -> 0.90 ms,
            # [16,512] 1.72 -> 1.13, [32,512] 3.10 -> 1.94, [48,512]
            # 4.90 -> 3.01, [8,512] 1.08 -> 0.80; ties at b=1 and loses at
            # t <= 256 (the nn/llama.py auto gate encodes that region)
            auto_k = tk_p
            auto_q = min(256, -(-tq // 128) * 128)
        else:
            auto_q, auto_k = 128, 128
        block_q = block_q or auto_q
        block_k = block_k or auto_k
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if kv_lens is None:
        kv_lens = jnp.full((b,), tk, dtype=jnp.int32)
    kv_lens = kv_lens.astype(jnp.int32)
    if kv_starts is None:
        kv_starts = jnp.zeros((b,), dtype=jnp.int32)
    kv_starts = kv_starts.astype(jnp.int32)
    return _flash_attention(
        q, k, v, kv_lens, kv_starts, causal, scale, block_q, block_k,
        bool(interpret),
    )


def _windowed_reference_attention(q, k, v, kv_lens, kv_starts, causal, scale):
    """XLA attention with the kernel's exact masking semantics: valid columns
    are [kv_starts, kv_lens), causal means col <= row (row index == slot), and
    fully-masked rows yield exact zeros (matching the kernel's finish step)."""
    tq, tk = q.shape[2], k.shape[2]
    col = jnp.arange(tk)[None, None, None, :]
    mask = jnp.logical_and(
        col >= kv_starts[:, None, None, None], col < kv_lens[:, None, None, None]
    )
    if causal:
        row = jnp.arange(tq)[None, None, :, None]
        mask = jnp.logical_and(mask, col <= row)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = jnp.where(mask, s * scale, NEG_INF)
    probs = jax.nn.softmax(s, axis=-1)
    any_valid = jnp.any(mask, axis=-1, keepdims=True)
    probs = jnp.where(any_valid, probs, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_attention(q, k, v, kv_lens, kv_starts, causal, scale, block_q,
                     block_k, interpret):
    return _flash_attention_impl(
        q, k, v, kv_lens, kv_starts, causal, scale, block_q, block_k, interpret
    )


def _flash_attention_fwd(q, k, v, kv_lens, kv_starts, causal, scale, block_q,
                         block_k, interpret):
    out = _flash_attention_impl(
        q, k, v, kv_lens, kv_starts, causal, scale, block_q, block_k, interpret
    )
    return out, (q, k, v, kv_lens, kv_starts)


def _flash_attention_bwd(causal, scale, block_q, block_k, interpret, res, g):
    q, k, v, kv_lens, kv_starts = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _windowed_reference_attention(
            q_, k_, v_, kv_lens, kv_starts, causal, scale
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g.astype(q.dtype))
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, f0(kv_lens), f0(kv_starts)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def _flash_attention_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lens: jnp.ndarray,
    kv_starts: jnp.ndarray,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> jnp.ndarray:
    b, h, tq, d = q.shape
    tk = k.shape[2]
    tq_p = -(-tq // block_q) * block_q
    tk_p = -(-tk // block_k) * block_k
    if tq_p != tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    if tk_p != tk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))

    grid = (b, h, tq_p // block_q, tk_p // block_k)

    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, d), lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_k, d), lambda bi, hi, qi, ki, *_: (bi, hi, ki, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_k, d), lambda bi, hi, qi, ki, *_: (bi, hi, ki, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, tq_p, d), q.dtype),
        interpret=interpret,
    )(kv_lens, kv_starts, q, k, v)
    return out[:, :, :tq, :]
