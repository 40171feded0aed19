"""Lightweight / dynamic convolution (Wu et al., ICLR'19).

TPU-native equivalents of the reference's CUDA kernels
(fairseq/fairseq/modules/lightconv_layer/lightconv_cuda_kernel.cu and
dynamicconv_layer/dynamicconv_cuda_kernel.cu, ~1000 LoC of hand-written
shared-memory tiling): both ops are expressed as one einsum over a shifted
stack of the input, which XLA lowers to MXU contractions — no scalar loops,
no dynamic shapes.

Shapes follow the fairseq modules: x [B, T, C], kernel size K, H heads with
C % H == 0; weights are softmax-normalised over K and optionally dropped
out (DropConnect) by the caller.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def shifted_stack(x: jnp.ndarray, kernel_size: int, padding_left: int) -> jnp.ndarray:
    """[B, T, C] -> [B, T, K, C]; entry k holds x at t + k - padding_left
    (zero outside).  One pad + K static slices — fusion-friendly."""
    b, t, c = x.shape
    pad_r = kernel_size - 1 - padding_left
    xp = jnp.pad(x, ((0, 0), (padding_left, max(pad_r, 0)), (0, 0)))
    cols = [xp[:, k : k + t] for k in range(kernel_size)]
    return jnp.stack(cols, axis=2)


def lightweight_conv(
    x: jnp.ndarray,  # [B, T, C]
    weights: jnp.ndarray,  # [H, K] shared across positions & batch
    padding_left: int | None = None,
    softmax: bool = True,
) -> jnp.ndarray:
    """LightConv: per-head depthwise conv with tied, normalised weights."""
    b, t, c = x.shape
    h, k = weights.shape
    if c % h:
        raise ValueError(f"channels {c} not divisible by heads {h}")
    if padding_left is None:
        padding_left = k - 1  # causal (decoder) default, like the CUDA op
    if softmax:
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1).astype(x.dtype)
    stack = shifted_stack(x, k, padding_left).reshape(b, t, k, h, c // h)
    return jnp.einsum("btkhd,hk->bthd", stack, weights).reshape(b, t, c)


def dynamic_conv(
    x: jnp.ndarray,  # [B, T, C]
    weights: jnp.ndarray,  # [B, T, H, K] predicted per position
    padding_left: int | None = None,
    softmax: bool = True,
) -> jnp.ndarray:
    """DynamicConv: position-dependent per-head conv weights."""
    b, t, c = x.shape
    _, _, h, k = weights.shape
    if c % h:
        raise ValueError(f"channels {c} not divisible by heads {h}")
    if padding_left is None:
        padding_left = k - 1
    if softmax:
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1).astype(x.dtype)
    stack = shifted_stack(x, k, padding_left).reshape(b, t, k, h, c // h)
    return jnp.einsum("btkhd,bthk->bthd", stack, weights).reshape(b, t, c)
