"""Beam-reorder gather as a Pallas DMA: out[i] = x[src[i]] done by the
block index_map, so the permutation costs one HBM read + one write at full
bandwidth with zero compute.

XLA lowers ``jnp.take_along_axis`` over the beam axis of the generated-KV
cache to a gather + K-way ``select_n`` chain that measured ~2.3x its HBM
roofline inside the decode loop (r3 trace at batch 48: 10 ms/step across
the 56 cache leaves).  Here the scalar-prefetched source-row vector drives
each output block's input index directly — the DMA engine performs the
gather (reference analog: the beam reorder inside
fairseq/fairseq/sequence_generator.py reorder_incremental_state).

NEGATIVE RESULT (r3, v5e): the remaining cost around this kernel is a
~271 ms/decode copy of its output back into the while-loop carry buffer
(fresh pallas outputs cannot alias the carry).  A ping-pong variant —
double-buffered cache leaves, ``input_output_aliases`` donating a scratch
destination, the loop body unrolled in pairs so buffers return to their
carry slots — measured SLOWER end-to-end (2.38-2.50 s vs 2.21 s per
64-step decode at batch 48): the donation does not eliminate the carry
copies in practice, a blocked dst spec even DMA-reads the dead destination
buffer (fixed with memory_space=ANY, still net negative), and the paired
body + trailing lax.cond add their own copies.  Don't re-attempt without
evidence XLA's while-loop buffer assignment changed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(src_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...]


def gather_rows(x: jnp.ndarray, src: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """out[i] = x[src[i]] over the leading axis.

    x: [N, ...] (>=2-D, trailing dims are copied whole); src: [M] int32.
    The index_map resolves src at grid-step granularity, so each output row
    is a single strided DMA from its source row — no select chains.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = x.shape[0]
    m = src.shape[0]
    block = (1,) + x.shape[1:]
    ndim = x.ndim

    def in_map(i, src_ref):
        return (src_ref[i],) + (0,) * (ndim - 1)

    def out_map(i, src_ref):
        return (i,) + (0,) * (ndim - 1)

    return pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m,),
            in_specs=[pl.BlockSpec(block, in_map)],
            out_specs=pl.BlockSpec(block, out_map),
        ),
        out_shape=jax.ShapeDtypeStruct((m,) + x.shape[1:], x.dtype),
        interpret=interpret,
    )(src.astype(jnp.int32), x)


def gather_beams_rows(x: jnp.ndarray, indices: jnp.ndarray, b: int, k: int) -> jnp.ndarray:
    """Beam-select rows of a flattened [B*K, ...] leaf: indices [B, K] pick
    the parent beam within each batch row."""
    flat_src = (indices + jnp.arange(b, dtype=indices.dtype)[:, None] * k).reshape(-1)
    return gather_rows(x, flat_src)
