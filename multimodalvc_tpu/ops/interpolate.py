"""Vectorized, static-shape time resampling.

The reference resizes features to data-dependent lengths with per-sample
Python loops over ``F.interpolate`` (reference: src/model.py:596-606,
src/modelSpeech.py:300-311).  That pattern is hostile to XLA (dynamic shapes,
host loops), so here the whole batch is resampled in one gather+lerp with
*static* output length: every sample is interpolated from its own source
length ``src_len[i]`` to its own target length ``tgt_len[i]`` inside fixed
[B, T_out] buffers, positions past ``tgt_len[i]`` zeroed.  This compiles to
one program regardless of the length mix and runs on the VPU.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear_resize_batched(
    x: jnp.ndarray,
    src_len: jnp.ndarray,
    tgt_len: jnp.ndarray,
    t_out: int,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Per-sample 1-D linear resize along time.

    Args:
      x: [B, T_in, D] features, valid up to src_len[i] per row.
      src_len: [B] int32 valid source lengths (>=1).
      tgt_len: [B] int32 desired output lengths (>=1, <= t_out).
      t_out: static output time size.
      align_corners: torch F.interpolate semantics switch.

    Returns: [B, t_out, D]; rows zero past tgt_len[i].
    """
    b, t_in, _ = x.shape
    src_len = src_len.astype(jnp.float32)
    tgt_len_f = tgt_len.astype(jnp.float32)
    t = jnp.arange(t_out, dtype=jnp.float32)[None, :]  # [1, T_out]
    if align_corners:
        scale = jnp.where(tgt_len_f > 1, (src_len - 1) / jnp.maximum(tgt_len_f - 1, 1), 0.0)
        pos = t * scale[:, None]
    else:
        scale = src_len / tgt_len_f
        pos = (t + 0.5) * scale[:, None] - 0.5
    pos = jnp.clip(pos, 0.0, src_len[:, None] - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, (src_len[:, None] - 1).astype(jnp.int32))
    frac = (pos - lo.astype(jnp.float32))[..., None].astype(x.dtype)
    x_lo = jnp.take_along_axis(x, jnp.clip(lo, 0, t_in - 1)[..., None], axis=1)
    x_hi = jnp.take_along_axis(x, jnp.clip(hi, 0, t_in - 1)[..., None], axis=1)
    out = x_lo * (1.0 - frac) + x_hi * frac
    valid = (jnp.arange(t_out)[None, :] < tgt_len[:, None])[..., None]
    return jnp.where(valid, out, jnp.zeros((), dtype=out.dtype))


def length_mask(lengths: jnp.ndarray, max_len: int, dtype=jnp.bool_) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] mask (True = valid)."""
    return (jnp.arange(max_len)[None, :] < lengths[:, None]).astype(dtype)
