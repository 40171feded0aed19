"""Ring attention: sequence-parallel exact attention over the mesh
"sequence" axis.

The reference has NO sequence/context parallelism (SURVEY.md §2.5 —
sequences are capped at 24 s and the Q-Former exists to compress them).
For long-form AVSR this is the scaling gap; here it's first-class: Q/K/V
are sharded along time over the "sequence" axis, each device computes
online-softmax partial attention against its resident K/V block, and K/V
blocks rotate around the ring with lax.ppermute (ICI neighbour traffic),
accumulating the exact softmax via the usual (m, l, acc) flash recurrence.
Compute overlaps communication across ring steps; memory per device is
O(T/P) with no [T, T] materialisation.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_attn(q, k, v, scale, q_off, kv_off, kv_valid, causal):
    """One ring step: scores of local q against one rotating kv block.

    q: [B,H,Tq,D], k/v: [B,H,Tk,D]. Returns (m, l, acc) contributions.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    tk = k.shape[2]
    kv_ids = kv_off + jnp.arange(tk)[None, None, None, :]
    valid = kv_ids < kv_valid
    if causal:
        tq = q.shape[2]
        q_ids = q_off + jnp.arange(tq)[None, None, :, None]
        valid = jnp.logical_and(valid, kv_ids <= q_ids)
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(jnp.float32)
    return m, l, acc


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "sequence",
    kv_len: Optional[jnp.ndarray] = None,  # scalar or [B] — global valid length(s)
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention with q/k/v time-sharded over ``axis``.

    Args are GLOBAL arrays [B, H, T, D]; T must divide by the axis size.
    Returns the globally-sharded output with the same layout.
    """
    n = mesh.shape[axis]
    b, h, t, d = q.shape
    assert t % n == 0, (t, n)
    chunk = t // n
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if kv_len is None:
        kv_len = jnp.full((b,), t, jnp.int32)
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))

    def local(q_c, k_c, v_c, kv_len):
        idx = jax.lax.axis_index(axis)
        q_off = idx * chunk
        kv_len = kv_len[:, None, None, None]  # per-batch valid lengths

        def step(i, carry):
            m_run, l_run, acc, k_rot, v_rot = carry
            # the block currently resident came from device (idx - i) mod n
            src = jnp.mod(idx - i, n)
            kv_off = src * chunk
            m_b, l_b, acc_b = _block_attn(
                q_c, k_rot, v_rot, scale, q_off, kv_off, kv_len, causal
            )
            m_new = jnp.maximum(m_run, m_b)
            alpha = jnp.exp(m_run - m_new)
            beta = jnp.exp(m_b - m_new)
            l_new = l_run * alpha + l_b * beta
            acc_new = acc * alpha + acc_b * beta
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_next = jax.lax.ppermute(k_rot, axis, perm)
            v_next = jax.lax.ppermute(v_rot, axis, perm)
            return m_new, l_new, acc_new, k_next, v_next

        m0 = jnp.full((b, h, chunk, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, h, chunk, 1), jnp.float32)
        acc0 = jnp.zeros((b, h, chunk, d), jnp.float32)
        m_f, l_f, acc_f, _, _ = jax.lax.fori_loop(
            0, n, step, (m0, l0, acc0, k_c, v_c)
        )
        out = acc_f / jnp.maximum(l_f, 1e-30)
        return out.astype(q_c.dtype)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3 + (P(None),),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return fn(q, k, v, kv_len)
