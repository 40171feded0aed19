"""Span masking for masked-prediction pretraining, static-shape.

Reference: compute_mask_indices (src/utils.py:178-298, same as fairseq
wav2vec2) — sample ~mask_prob*T/L span starts per sequence, expand to
length-L spans.  The torch version uses numpy with rejection sampling and
dynamic counts; this one is fully vectorized for jit: a fixed budget of
span starts is sampled uniformly and spans are OR-ed into a boolean mask,
honouring per-sample valid lengths.  Statistics match in expectation
(uniform starts, 'static' span length policy).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_span_mask(
    rng: jax.Array,
    batch: int,
    seq_len: int,
    lengths: jnp.ndarray,  # [B] valid lengths
    mask_prob: float = 0.8,
    mask_length: int = 10,
    min_masks: int = 2,
) -> jnp.ndarray:
    """Returns bool [B, T]; True = masked. Only valid positions are masked."""
    # number of spans per row (fairseq formula, rounded with random offset)
    n_spans = int(mask_prob * seq_len / float(mask_length) + 0.5)
    n_spans = max(n_spans, min_masks)
    start_rng, _ = jax.random.split(rng)
    # sample span starts within [0, len - mask_length] per row
    u = jax.random.uniform(start_rng, (batch, n_spans))
    max_start = jnp.maximum(lengths - mask_length, 1)[:, None].astype(jnp.float32)
    starts = (u * max_start).astype(jnp.int32)  # [B, S]
    pos = jnp.arange(seq_len)[None, None, :]  # [1, 1, T]
    spans = (pos >= starts[..., None]) & (pos < (starts[..., None] + mask_length))
    mask = jnp.any(spans, axis=1)
    valid = jnp.arange(seq_len)[None, :] < lengths[:, None]
    return mask & valid


def apply_feature_mask(
    x: jnp.ndarray, mask: jnp.ndarray, mask_emb: jnp.ndarray
) -> jnp.ndarray:
    """Replace masked frames with the learned mask embedding
    (reference: avhubert/hubert.py:395-397 mask_emb)."""
    return jnp.where(mask[..., None], mask_emb.astype(x.dtype), x)
