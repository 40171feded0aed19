"""Gen-segment decode attention with in-kernel beam-ancestry selection.

Eliminates the per-step beam reorder of the generated KV cache.  The r3
design physically gathered the 56 gen-KV leaves every decode step
(ops/beam_gather.py) — one full read + write of ~1.8 GB at batch 48 —
plus XLA's unavoidable copy of the fresh pallas outputs back into the
while-loop carry (~271 ms per 64-step decode, r3 measurement).  Here the
cache is NEVER reordered: each row appends its own step-KV at its own
slot, and a tiny ancestry map ``anc [B*K, L]`` records, per (row, slot),
WHICH beam row of the same batch element holds that slot's true KV.  The
attention kernel loads all K rows of a batch element into VMEM anyway
(they share the HBM tiles), computes q·k against all K sources, and
selects by ancestry with a one-hot reduce in registers — so the
"reorder" costs zero HBM traffic.  Only the [B*K, L] int32 map is
gathered per step (~60 KB vs ~1.8 GB).

Reference analog being replaced: fairseq SequenceGenerator's
reorder_incremental_state / HF generate's _reorder_cache.

The kernel emits softmax PARTIALS (weighted-V accumulator, row max,
normalizer) so the caller merges them with the shared-prompt segment's
partials — flash-attention's standard two-segment combine.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(
    q_ref,  # [1, K, h, d]
    k_ref,  # [1, K, L, g, d] (bf16/f32, or int8 when scales are present)
    v_ref,  # [1, K, L, g, d]
    anc_ref,  # [1, K, L] int32
    len_ref,  # [1, 1] int32 (SMEM): valid slots
    *rest,  # [ks_ref, vs_ref,] out_ref, m_ref, l_ref
    beams: int,
    heads: int,
    groups: int,
    head_dim: int,
    slots: int,
    scale: float,
    quantized: bool,
):
    # All refs carry an explicit leading batch-block dim of 1: Mosaic requires
    # the LAST TWO block dims to be (8,128)-divisible or full — separating the
    # (b, beams) row structure keeps every checked trailing pair full-sized.
    # The body stays at rank <= 4 throughout (rank-5 vector ops and einsums
    # with >1 batch dim crash the Mosaic compiler): the ancestry one-hot
    # select is a static unrolled loop over the Ks source rows, with scores
    # and probabilities held in a [g, Kq*rep, L] layout so every contraction
    # is a single-batch 3-D einsum.
    if quantized:
        ks_ref, vs_ref, out_ref, m_ref, l_ref = rest
    else:
        out_ref, m_ref, l_ref = rest
    kq = beams
    rep = heads // groups
    x = kq * rep
    q = q_ref[0].astype(jnp.float32)  # [Kq, h, d]
    anc = anc_ref[0]  # [Kq, L]
    valid = len_ref[0, 0]

    # q in [g, Kq*rep, d]
    qg = q.reshape(kq, groups, rep, head_dim)
    qx = qg.transpose(1, 0, 2, 3).reshape(groups, x, head_dim)

    slot_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (1, slots), 1)[0] < valid
    )  # [L]

    def source(s_idx):
        """(dequantized k3, v3, row mask) of source row s_idx, in
        ([g, L, d], [g, L, d], [1, Kq*rep, L]) layout."""
        k_s = k_ref[0, s_idx].astype(jnp.float32)  # [L, g, d]
        v_s = v_ref[0, s_idx].astype(jnp.float32)
        if quantized:
            # int8 KV: dequantize IN VMEM — halves the dominant decode-step
            # HBM stream (the gen-KV cache read); an XLA-level astype+mul
            # would materialize the bf16 copy in HBM and erase the saving
            k_s = k_s * ks_ref[0, s_idx].astype(jnp.float32)[..., None]
            v_s = v_s * vs_ref[0, s_idx].astype(jnp.float32)[..., None]
        k3 = k_s.transpose(1, 0, 2)  # [g, L, d]
        v3 = v_s.transpose(1, 0, 2)
        m_s = (anc == s_idx)[:, None, :]  # [Kq, 1, L]
        m3 = jnp.broadcast_to(m_s, (kq, rep, slots)).reshape(1, x, slots)
        return k3, v3, m3

    # ancestry-selected scores: sel[g, x, l] = scale * q . k_(anc_l, l)
    sel = jnp.zeros((groups, x, slots), jnp.float32)
    masks = []
    vs = []
    for s_idx in range(beams):
        k3, v3, m3 = source(s_idx)
        s3 = jnp.einsum(
            "gxd,gld->gxl", qx, k3, preferred_element_type=jnp.float32
        )
        sel = sel + jnp.where(m3, s3, 0.0)
        masks.append(m3)
        vs.append(v3)
    sel = sel * scale
    sel = jnp.where(slot_ok[None, None, :], sel, NEG)

    m = jnp.max(sel, axis=-1)  # [g, x]
    p = jnp.exp(sel - m[..., None])  # [g, x, L]
    p = jnp.where(slot_ok[None, None, :], p, 0.0)
    lsum = jnp.sum(p, axis=-1)  # [g, x]

    # weighted V with the same per-source masks: out[g, x, d]
    out = jnp.zeros((groups, x, head_dim), jnp.float32)
    for s_idx in range(beams):
        out = out + jnp.einsum(
            "gxl,gld->gxd",
            jnp.where(masks[s_idx], p, 0.0),
            vs[s_idx],
            preferred_element_type=jnp.float32,
        )

    out_ref[...] = (
        out.reshape(groups, kq, rep, head_dim)
        .transpose(1, 0, 2, 3)
        .reshape(1, kq, heads, head_dim)
    )
    # m/l leave the kernel in [g, Kq*rep] layout — a small-vector rank-3
    # transpose here crashes the Mosaic compiler; the caller relayouts in XLA.
    m_ref[...] = m.reshape(1, groups, x)
    l_ref[...] = lsum.reshape(1, groups, x)


def gen_attention_ancestor(
    q: jnp.ndarray,  # [B*K, h, d]
    gen_k: jnp.ndarray,  # [B*K, L, g, d]
    gen_v: jnp.ndarray,  # [B*K, L, g, d]
    anc: jnp.ndarray,  # [B*K, L] int32 (values 0..K-1, within-batch rows)
    valid_len: jnp.ndarray,  # scalar int32
    *,
    beams: int,
    scale: float,
    k_scale: jnp.ndarray = None,  # [B*K, L, g] f32 — set when gen_k/v are int8
    v_scale: jnp.ndarray = None,
    interpret=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Softmax partials (out, m, l) of the ancestry-selected gen segment.

    out = sum_l exp(s_l - m) * v_(anc_l, l), m = max_l s_l, l = sum exp(...)
    with s_l = scale * q . k_(anc_l, l) for slots l < valid_len.  Rows with
    valid_len == 0 return (0, NEG, 0) and merge as a no-op segment.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows, h, d = q.shape
    _, slots, g, _ = gen_k.shape
    b = rows // beams
    quantized = k_scale is not None
    kern = functools.partial(
        _kernel, beams=beams, heads=h, groups=g, head_dim=d, slots=slots,
        scale=scale, quantized=quantized,
    )
    # Separate rows into (b, beams, ...) so Mosaic's trailing-two-dims block
    # check always sees full dims (beams is 5 — neither 8-divisible nor full
    # as a sublane block over the flat row axis).
    in_specs = [
        pl.BlockSpec((1, beams, h, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, beams, slots, g, d), lambda i: (i, 0, 0, 0, 0)),
        pl.BlockSpec((1, beams, slots, g, d), lambda i: (i, 0, 0, 0, 0)),
        pl.BlockSpec((1, beams, slots), lambda i: (i, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    operands = [
        q.reshape(b, beams, h, d),
        gen_k.reshape(b, beams, slots, g, d),
        gen_v.reshape(b, beams, slots, g, d),
        anc.reshape(b, beams, slots),
        valid_len.reshape(1, 1).astype(jnp.int32),
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, beams, slots, g), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, beams, slots, g), lambda i: (i, 0, 0, 0)),
        ]
        operands += [
            k_scale.reshape(b, beams, slots, g),
            v_scale.reshape(b, beams, slots, g),
        ]
    rep = h // g
    xdim = beams * rep
    out, m, l = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, beams, h, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, g, xdim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, g, xdim), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, beams, h, d), jnp.float32),
            jax.ShapeDtypeStruct((b, g, xdim), jnp.float32),
            jax.ShapeDtypeStruct((b, g, xdim), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    # m/l come back in kernel-native [g, beams*rep] layout (the in-kernel
    # relayout crashes Mosaic on these tiny vectors); fix up in XLA.
    m = m.reshape(b, g, beams, rep).transpose(0, 2, 1, 3).reshape(rows, h)
    l = l.reshape(b, g, beams, rep).transpose(0, 2, 1, 3).reshape(rows, h)
    return out.reshape(rows, h, d), m, l


def gen_attention_ancestor_ref(
    q, gen_k, gen_v, anc, valid_len, *, beams, scale, k_scale=None, v_scale=None
):
    """Pure-jnp oracle with identical semantics (tests + CPU fallback)."""
    rows, h, d = q.shape
    _, slots, g, _ = gen_k.shape
    b = rows // beams
    rep = h // g
    gk32 = gen_k.astype(jnp.float32)
    gv32 = gen_v.astype(jnp.float32)
    if k_scale is not None:
        gk32 = gk32 * k_scale.astype(jnp.float32)[..., None]
        gv32 = gv32 * v_scale.astype(jnp.float32)[..., None]
    qb = q.reshape(b, beams, g, rep, d).astype(jnp.float32)
    kb = gk32.reshape(b, beams, slots, g, d)
    vb = gv32.reshape(b, beams, slots, g, d)
    ab = anc.reshape(b, beams, slots)
    s = jnp.einsum("bqgrd,bslgd->bqsgrl", qb, kb) * scale
    onehot = ab[:, :, None, :] == jnp.arange(beams)[None, None, :, None]
    sel = jnp.sum(jnp.where(onehot[:, :, :, None, None, :], s, 0.0), axis=2)
    ok = jnp.arange(slots) < valid_len
    sel = jnp.where(ok[None, None, None, None, :], sel, NEG)
    m = jnp.max(sel, axis=-1)
    p = jnp.where(ok[None, None, None, None, :], jnp.exp(sel - m[..., None]), 0.0)
    lsum = jnp.sum(p, axis=-1)
    v_sel = jnp.sum(
        jnp.where(onehot[:, :, :, :, None, None], vb[:, None], 0.0), axis=2
    )  # [b, Kq, L, g, d]
    out = jnp.einsum("bqgrl,bqlgd->bqgrd", p, v_sel)
    return (
        out.reshape(rows, h, d),
        m.reshape(rows, h),
        lsum.reshape(rows, h),
    )


def merge_softmax_segments(out_a, m_a, l_a, out_b, m_b, l_b):
    """Combine two segments' (weighted-V, max, normalizer) partials into the
    final attention output — the flash-attention two-block merge."""
    m = jnp.maximum(m_a, m_b)
    ca = jnp.exp(m_a - m)[..., None]
    cb = jnp.exp(m_b - m)[..., None]
    num = out_a * ca + out_b * cb
    den = (l_a * jnp.exp(m_a - m) + l_b * jnp.exp(m_b - m))[..., None]
    return num / jnp.maximum(den, 1e-30)


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-vector int8 over the trailing (head_dim) axis:
    [..., d] -> (int8 [..., d], f32 scale [...]).  The KV-cache serving
    format — halves cache HBM traffic; dequantization happens in VMEM inside
    the decode attention kernels."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(a / 127.0, 1e-8)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, s


def _prompt_kernel(
    q_ref,  # [1, K, h, d]
    k_ref,  # [1, g, Tp, d]
    v_ref,  # [1, g, Tp, d]
    mask_ref,  # [1, 1, Tp] int32
    *rest,  # [ks_ref [1, g, Tp], vs_ref,] out_ref, m_ref, l_ref
    beams: int,
    heads: int,
    groups: int,
    head_dim: int,
    scale: float,
    quantized: bool,
):
    # Rank <= 3 vector ops + single-batch 3-D einsums only (higher-rank
    # einsums crash the Mosaic compiler) — q lives in [g, K*rep, d].
    if quantized:
        ks_ref, vs_ref, out_ref, m_ref, l_ref = rest
    else:
        out_ref, m_ref, l_ref = rest
    rep = heads // groups
    x = beams * rep
    q = q_ref[0].astype(jnp.float32).reshape(beams, groups, rep, head_dim)
    qx = q.transpose(1, 0, 2, 3).reshape(groups, x, head_dim)
    k = k_ref[0].astype(jnp.float32)  # [g, Tp, d]
    v = v_ref[0].astype(jnp.float32)
    if quantized:
        k = k * ks_ref[0].astype(jnp.float32)[..., None]
        v = v * vs_ref[0].astype(jnp.float32)[..., None]
    s = jnp.einsum("gxd,gpd->gxp", qx, k, preferred_element_type=jnp.float32)
    s = s * scale
    ok = mask_ref[0, 0] != 0  # [Tp]
    s = jnp.where(ok[None, None, :], s, NEG)
    m = jnp.max(s, axis=-1)  # [g, x]
    p = jnp.where(ok[None, None, :], jnp.exp(s - m[..., None]), 0.0)
    lsum = jnp.sum(p, axis=-1)
    out = jnp.einsum("gxp,gpd->gxd", p, v, preferred_element_type=jnp.float32)
    out_ref[...] = (
        out.reshape(groups, beams, rep, head_dim)
        .transpose(1, 0, 2, 3)
        .reshape(1, beams, heads, head_dim)
    )
    # m/l leave in [g, beams*rep] layout — see _kernel; caller relayouts.
    m_ref[...] = m.reshape(1, groups, x)
    l_ref[...] = lsum.reshape(1, groups, x)


def prompt_attention(
    q: jnp.ndarray,  # [B*K, h, d]
    prompt_k: jnp.ndarray,  # [B, g, Tp, d] (bf16 or int8 with scales)
    prompt_v: jnp.ndarray,
    prompt_mask: jnp.ndarray,  # [B, Tp] nonzero = valid
    *,
    beams: int,
    scale: float,
    k_scale: jnp.ndarray = None,  # [B, g, Tp]
    v_scale: jnp.ndarray = None,
    interpret=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared-prompt segment softmax partials, one batch element per grid
    step (the K beam rows share its KV tiles in VMEM)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows, h, d = q.shape
    b, g, tp, _ = prompt_k.shape
    quantized = k_scale is not None
    kern = functools.partial(
        _prompt_kernel, beams=beams, heads=h, groups=g, head_dim=d,
        scale=scale, quantized=quantized,
    )
    # Same (b, beams) separation as the gen kernel: trailing block dims must
    # be full or (8,128)-divisible, and neither beams=5 nor a length-1 mask
    # sublane block satisfies that over flat row-major layouts.
    in_specs = [
        pl.BlockSpec((1, beams, h, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, g, tp, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, g, tp, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, 1, tp), lambda i: (i, 0, 0)),
    ]
    operands = [
        q.reshape(b, beams, h, d),
        prompt_k,
        prompt_v,
        prompt_mask.astype(jnp.int32).reshape(b, 1, tp),
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, g, tp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, g, tp), lambda i: (i, 0, 0)),
        ]
        operands += [k_scale, v_scale]
    rep = h // g
    xdim = beams * rep
    out, m, l = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, beams, h, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, g, xdim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, g, xdim), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, beams, h, d), jnp.float32),
            jax.ShapeDtypeStruct((b, g, xdim), jnp.float32),
            jax.ShapeDtypeStruct((b, g, xdim), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    m = m.reshape(b, g, beams, rep).transpose(0, 2, 1, 3).reshape(rows, h)
    l = l.reshape(b, g, beams, rep).transpose(0, 2, 1, 3).reshape(rows, h)
    return out.reshape(rows, h, d), m, l


def prompt_attention_ref(
    q, prompt_k, prompt_v, prompt_mask, *, beams, scale, k_scale=None, v_scale=None
):
    """Pure-jnp oracle for prompt_attention."""
    rows, h, d = q.shape
    b, g, tp, _ = prompt_k.shape
    rep = h // g
    k = prompt_k.astype(jnp.float32)
    v = prompt_v.astype(jnp.float32)
    if k_scale is not None:
        k = k * k_scale.astype(jnp.float32)[..., None]
        v = v * v_scale.astype(jnp.float32)[..., None]
    qb = q.reshape(b, beams, g, rep, d).astype(jnp.float32)
    s = jnp.einsum("bkgrd,bgpd->bkgrp", qb, k) * scale
    ok = prompt_mask.astype(bool)
    s = jnp.where(ok[:, None, None, None, :], s, NEG)
    m = jnp.max(s, axis=-1)
    p = jnp.where(ok[:, None, None, None, :], jnp.exp(s - m[..., None]), 0.0)
    lsum = jnp.sum(p, axis=-1)
    out = jnp.einsum("bkgrp,bgpd->bkgrd", p, v)
    return (
        out.reshape(rows, h, d),
        m.reshape(rows, h),
        lsum.reshape(rows, h),
    )
