"""Fused int8-weight matmul Pallas kernel: y = (x @ W_q) * scale.

Decode-time LLaMA steps are HBM-bandwidth-bound on weight reads (the whole
3B-parameter trunk streams through the MXU per token).  Storing the dense
kernels as int8 + per-output-channel scales halves the bytes read; this
kernel converts each W tile to bf16 **in VMEM** and feeds the MXU, so the
dequantization never round-trips HBM — the fusion XLA would not do on its
own (see runtime/quantization.py: an XLA `convert` + `dot` showed no win
because the f32 dequantized weights hit HBM).

Reference analog: fairseq's scalar quantization modules
(fairseq/fairseq/modules/quantization/scalar) emulate int8 in training;
here int8 is a real serving format on the decode path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int8_matmul_kernel(
    x_ref,  # VMEM [rows, block_in] (x dtype)
    w_ref,  # VMEM [block_in, block_out] int8
    s_ref,  # VMEM [1, block_out] f32 per-channel scales
    o_ref,  # VMEM [rows, block_out]
    acc_scr,  # VMEM [rows, block_out] f32
    *,
    n_in_blocks: int,
):
    ib = pl.program_id(1)

    @pl.when(ib == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x = x_ref[...].astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)  # int8 -> bf16 in-register
    acc_scr[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ib == n_in_blocks - 1)
    def _finish():
        o_ref[...] = (acc_scr[...] * s_ref[...]).astype(o_ref.dtype)


def int8_matmul(
    x: jnp.ndarray,  # [..., d_in]
    w_q: jnp.ndarray,  # [d_in, d_out] int8
    scale: jnp.ndarray,  # [d_out] or [1, d_out] f32
    block_in: int = 1024,  # TPU sweep: 1024x1024 fastest for 3072-wide trunks
    block_out: int = 1024,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """y = (x @ w_q) * scale with the weight tile dequantized in VMEM.

    Leading dims of x are flattened; rows are padded to the sublane multiple.
    interpret=None auto-enables interpreter mode off-TPU.  Falls back to the
    XLA expression for shapes the kernel does not cover.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d_in, d_out = w_q.shape
    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, d_in)
    out_dtype = out_dtype or x.dtype
    scale2 = scale.reshape(1, d_out).astype(jnp.float32)

    if d_in % 128 or d_out % 128 or rows > 512:
        # odd shapes, or many rows (prefill/training — compute-bound, weight
        # bytes amortised over rows): plain XLA path
        y = jnp.einsum(
            "rd,df->rf", x2.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return (y * scale2).astype(out_dtype).reshape(*lead, d_out)

    def _fit(block, dim):
        # largest multiple-of-128 divisor of dim that is <= block
        b = min(block, dim)
        while dim % b or b % 128:
            b -= 128
        return b

    if d_out >= 16384 and rows <= 256:
        # very wide outputs (the tied-lm-head unembed, [3072, 128256]):
        # a full-depth in-block + 2048-wide out-block re-reads x fewer
        # times (v5e sweep at rows=240: 2.61 ms at 1024x1024 -> 2.39 at
        # 3072x2048); trunk-shaped matmuls keep the 1024x1024 default.
        # Gated on rows <= 256 (validated at 240): at 512 rows the bf16
        # dequant of the 3072x2048 tile + x/acc/out blocks (~12+3+4+2 MB)
        # risks the VMEM budget, so larger row counts keep 1024x1024.
        block_in = _fit(max(block_in, 4096), d_in)
        block_out = _fit(max(block_out, 2048), d_out)
    else:
        block_in = _fit(block_in, d_in)
        block_out = _fit(block_out, d_out)
    rows_p = max(-(-rows // 16) * 16, 16)
    if rows_p != rows:
        x2 = jnp.pad(x2, ((0, rows_p - rows), (0, 0)))
    n_in = d_in // block_in
    n_out = d_out // block_out
    kernel = functools.partial(_int8_matmul_kernel, n_in_blocks=n_in)
    out = pl.pallas_call(
        kernel,
        grid=(n_out, n_in),
        in_specs=[
            pl.BlockSpec((rows_p, block_in), lambda ob, ib: (0, ib)),
            pl.BlockSpec((block_in, block_out), lambda ob, ib: (ib, ob)),
            pl.BlockSpec((1, block_out), lambda ob, ib: (0, ob)),
        ],
        out_specs=pl.BlockSpec((rows_p, block_out), lambda ob, ib: (0, ob)),
        scratch_shapes=[pltpu.VMEM((rows_p, block_out), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((rows_p, d_out), out_dtype),
        interpret=interpret,
    )(x2, w_q, scale2)
    return out[:rows].reshape(*lead, d_out)


_QUANT_CHUNK = 4096  # columns per quantization step: bounds the f32 temps
# (quantizing the 3072 x 128k tied-lm-head copy eagerly otherwise allocates
# several ~1.6 GB intermediates while the float trunk is still resident —
# an async allocation failure that surfaces at the next blocking call)


@jax.jit
def _quantize_int8_chunk(w32):
    amax = jnp.maximum(jnp.max(jnp.abs(w32), axis=0), 1e-12)
    scale = amax / 127.0
    w_q = jnp.clip(jnp.round(w32 / scale[None, :]), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_kernel(w: jnp.ndarray) -> tuple:
    """[d_in, d_out] float kernel -> (w_q int8, scale [d_out] f32),
    symmetric per-output-channel.  Processed in column chunks under jit."""
    w32 = jnp.asarray(w, jnp.float32)
    d_out = w32.shape[1]
    parts = [
        _quantize_int8_chunk(w32[:, c : c + _QUANT_CHUNK])
        for c in range(0, d_out, _QUANT_CHUNK)
    ]
    return (
        jnp.concatenate([p[0] for p in parts], axis=1),
        jnp.concatenate([p[1] for p in parts], axis=0).astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# int4 weight-only path (group-wise scales, half-split nibble packing)
# ---------------------------------------------------------------------------
#
# Serving-format analog of the reference's 4-bit NF4 LLaMA
# (src/model.py:231-238, bitsandbytes double-quant).  TPU deviation: uniform
# symmetric int4 with per-[group x out-channel] scales (AWQ/GPTQ-style g=128)
# instead of the NF4 codebook — a codebook gather per weight element does not
# map to the VPU, while a group-scale multiply does.
#
# Packing: nibble i of packed row r holds TWO logical rows split HALF/HALF
# along d_in — packed[r] = (w_q[r] & 0xF) | (w_q[r + d_in//2] << 4).  The
# half-split (rather than interleaving adjacent rows) means unpacking in VMEM
# is two plain slices of x and two dequantized tiles, with no sublane
# shuffling.

INT4_GROUP = 128


@functools.partial(jax.jit, static_argnames=("group",))
def _quantize_int4_chunk(w32, group: int):
    d_in, d_out = w32.shape
    g = w32.reshape(d_in // group, group, d_out)
    amax = jnp.maximum(jnp.max(jnp.abs(g), axis=1), 1e-12)  # [G, d_out]
    scale = amax / 7.0
    q = jnp.clip(jnp.round(g / scale[:, None, :]), -7, 7).astype(jnp.int8)
    q = q.reshape(d_in, d_out)
    half = d_in // 2
    packed = jnp.bitwise_or(
        jnp.bitwise_and(q[:half], jnp.int8(0xF)), jnp.left_shift(q[half:], 4)
    ).astype(jnp.int8)
    return packed, scale


def quantize_kernel_int4(w: jnp.ndarray, group: int = INT4_GROUP) -> tuple:
    """[d_in, d_out] float kernel -> (packed [d_in//2, d_out] int8,
    scales [d_in//group, d_out] f32), symmetric int4 per (group, channel).
    Processed in column chunks under jit (see _QUANT_CHUNK)."""
    w32 = jnp.asarray(w, jnp.float32)
    d_in, d_out = w32.shape
    assert d_in % (2 * group) == 0, (d_in, group)
    parts = [
        _quantize_int4_chunk(w32[:, c : c + _QUANT_CHUNK], group)
        for c in range(0, d_out, _QUANT_CHUNK)
    ]
    return (
        jnp.concatenate([p[0] for p in parts], axis=1),
        jnp.concatenate([p[1] for p in parts], axis=1).astype(jnp.float32),
    )


def _int4_matmul_kernel(
    x_ref,  # VMEM [rows, d_in] (full, unblocked)
    w_ref,  # VMEM [bp, block_out] int8 packed (two nibbles per byte)
    s_lo_ref,  # VMEM [1, gp, block_out] f32 scales for the low-nibble rows
    s_hi_ref,  # VMEM [1, gp, block_out] f32 scales for the high-nibble rows
    o_ref,  # VMEM [rows, block_out]
    acc_scr,  # VMEM [rows, block_out] f32
    *,
    n_in_blocks: int,
    bp: int,
    half: int,
    group: int,
):
    ib = pl.program_id(1)

    @pl.when(ib == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # unpack in i32: Mosaic only legalizes shifts on i32 vectors (i8/i16
    # shli fails to lower), so the nibble unpack pays 32-bit lane width.
    # Low nibble: mask + sign-extend via xor/sub; high nibble: arithmetic
    # shift of the sign-extended byte keeps the sign for free.
    w8 = w_ref[...].astype(jnp.int32)
    lo = ((w8 & 0xF) ^ 8) - 8
    hi = w8 >> 4
    gp = bp // group  # scale rows covered by this block's half-slice

    def dequant(nib, s):  # s: [gp, block_out]
        s_full = jnp.broadcast_to(s[:, None, :], (gp, group, s.shape[-1]))
        s_full = s_full.reshape(bp, s.shape[-1])
        return nib.astype(jnp.bfloat16) * s_full.astype(jnp.bfloat16)

    x_lo = x_ref[:, pl.ds(ib * bp, bp)].astype(jnp.bfloat16)
    x_hi = x_ref[:, pl.ds(half + ib * bp, bp)].astype(jnp.bfloat16)
    acc_scr[...] += jax.lax.dot_general(
        x_lo, dequant(lo, s_lo_ref[0]), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] += jax.lax.dot_general(
        x_hi, dequant(hi, s_hi_ref[0]), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ib == n_in_blocks - 1)
    def _finish():
        o_ref[...] = acc_scr[...].astype(o_ref.dtype)


def int4_matmul(
    x: jnp.ndarray,  # [..., d_in]
    w_packed: jnp.ndarray,  # [d_in//2, d_out] int8 (half-split nibbles)
    scale: jnp.ndarray,  # [d_in//group, d_out] f32
    group: int = INT4_GROUP,
    block_in: int = 1024,  # logical (unpacked) rows per grid step
    block_out: int = 1024,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """y = x @ dequant(w_packed, scale), dequantized tile-by-tile in VMEM."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    half, d_out = w_packed.shape
    d_in = half * 2
    n_groups = scale.shape[0]
    assert scale.shape == (d_in // group, d_out)
    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, d_in)
    out_dtype = out_dtype or x.dtype

    def _xla():
        w8 = w_packed.astype(jnp.int32)
        lo = ((w8 & 0xF) ^ 8) - 8
        hi = w8 >> 4
        # dequantize straight to bf16 — an f32 intermediate would double the
        # (large) temporary weight buffer at prefill
        q = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
        w = (
            q.reshape(n_groups, group, d_out) * scale[:, None, :].astype(jnp.bfloat16)
        ).reshape(d_in, d_out)
        y = jnp.einsum(
            "rd,df->rf", x2.astype(jnp.bfloat16), w,
            preferred_element_type=jnp.float32,
        )
        return y.astype(out_dtype).reshape(*lead, d_out)

    if half % 128 or d_out % 128 or half % group or rows > 512:
        return _xla()

    def _fit(block, dim):
        b = min(block, dim)
        while dim % b or b % group:
            b -= group
        return b

    block_in = _fit(block_in, half)  # logical rows per half-slice
    block_out_f = min(block_out, d_out)
    while d_out % block_out_f or block_out_f % 128:
        block_out_f -= 128
    block_out = block_out_f
    rows_p = max(-(-rows // 16) * 16, 16)
    if rows_p != rows:
        x2 = jnp.pad(x2, ((0, rows_p - rows), (0, 0)))
    n_in = half // block_in
    n_out = d_out // block_out
    gp = block_in // group
    # static lo/hi scale halves, reshaped to [n_in, gp, d_out] so each grid
    # step's block covers the FULL gp dim (Pallas requires the sublane block
    # dim to divide 8 or equal the array dim) — no dynamic slicing in-kernel
    s_lo = scale[: half // group].reshape(half // block_in, gp, d_out)
    s_hi = scale[half // group :].reshape(half // block_in, gp, d_out)
    kernel = functools.partial(
        _int4_matmul_kernel, n_in_blocks=n_in, bp=block_in, half=half, group=group
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_out, n_in),
        in_specs=[
            pl.BlockSpec((rows_p, d_in), lambda ob, ib: (0, 0)),
            pl.BlockSpec((block_in, block_out), lambda ob, ib: (ib, ob)),
            pl.BlockSpec((1, gp, block_out), lambda ob, ib: (ib, 0, ob)),
            pl.BlockSpec((1, gp, block_out), lambda ob, ib: (ib, 0, ob)),
        ],
        out_specs=pl.BlockSpec((rows_p, block_out), lambda ob, ib: (0, ob)),
        scratch_shapes=[pltpu.VMEM((rows_p, block_out), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((rows_p, d_out), out_dtype),
        interpret=interpret,
    )(x2, w_packed, s_lo, s_hi)
    return out[:rows].reshape(*lead, d_out)
