"""Shared flax.linen building blocks for every encoder/decoder in the zoo.

These replace the torch modules used across the reference stack
(torch.nn.MultiheadAttention, fairseq TransformerEncoder layers, HF
attention blocks) with mesh-aware JAX equivalents: fp32 softmax, optional
Pallas flash attention on the hot path, and logical sharding annotations so
pjit can split heads/ffn over the "tensor" axis.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention, flash_attention

Dtype = jnp.dtype


def use_flash(tq: int, tk: int, head_dim: int) -> bool:
    """Heuristic: Pallas flash kernel only pays off on TPU with real lengths."""
    if jax.default_backend() not in ("tpu",):
        return False
    return tq >= 256 and tk >= 256 and head_dim % 64 == 0


class DenseGeneral(nn.Dense):
    pass


class MultiHeadAttention(nn.Module):
    """MHA with self/cross support, padding masks, optional relative bias.

    kv lengths are dynamic (padding), shapes static — the mask/length path is
    fully vectorized so one compiled program serves every batch.
    """

    num_heads: int
    head_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    causal: bool = False
    out_features: Optional[int] = None
    use_bias: bool = True
    # shard self-attention over the mesh "sequence" axis (ring attention);
    # active only when the current mesh has sequence > 1 and T divides it
    sequence_parallel: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, Tq, D]
        kv: Optional[jnp.ndarray] = None,  # [B, Tk, Dkv] (defaults to x)
        *,
        mask: Optional[jnp.ndarray] = None,  # broadcastable to [B,H,Tq,Tk]
        kv_lens: Optional[jnp.ndarray] = None,  # [B]
        bias: Optional[jnp.ndarray] = None,  # additive [B|1,H,Tq,Tk]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        kv = x if kv is None else kv
        d_model = x.shape[-1]
        head_dim = self.head_dim or d_model // self.num_heads
        inner = self.num_heads * head_dim

        dense = lambda name: nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype, name=name)
        q = dense("q_proj")(x)
        k = dense("k_proj")(kv)
        v = dense("v_proj")(kv)

        b, tq = q.shape[:2]
        tk = k.shape[1]
        split = lambda t: t.reshape(b, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        if self.sequence_parallel and bias is None and mask is None and tq == tk:
            from ..ops.ring_attention import ring_attention
            from ..parallel.mesh import get_current_mesh

            mesh = get_current_mesh()
            if mesh is not None and mesh.shape.get("sequence", 1) > 1 and tq % mesh.shape["sequence"] == 0:
                out = ring_attention(
                    q, k, v, mesh, kv_len=kv_lens, causal=self.causal
                )
            else:
                out = dot_product_attention(
                    q, k, v,
                    mask=None if kv_lens is None else (
                        jnp.arange(tk)[None, None, None, :] < kv_lens[:, None, None, None]
                    ),
                    causal=self.causal,
                )
        elif (
            bias is None
            and mask is None
            and use_flash(tq, tk, head_dim)
        ):
            out = flash_attention(q, k, v, kv_lens=kv_lens, causal=self.causal)
        else:
            if kv_lens is not None and mask is None:
                mask = (jnp.arange(tk)[None, None, None, :] < kv_lens[:, None, None, None])
            out = dot_product_attention(q, k, v, bias=bias, mask=mask, causal=self.causal)

        out = out.transpose(0, 2, 1, 3).reshape(b, tq, inner)
        if self.dropout > 0 and not deterministic:
            out = nn.Dropout(rate=self.dropout)(out, deterministic=False)
        return nn.Dense(
            self.out_features or d_model, use_bias=self.use_bias, dtype=self.dtype, name="out_proj"
        )(out)


def gelu_exact(x):
    """erf-based GELU (torch F.gelu default; fairseq 'gelu')."""
    return nn.gelu(x, approximate=False)


class FeedForward(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    activation: Callable = gelu_exact
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        h = self.activation(h)
        if self.dropout > 0 and not deterministic:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        return nn.Dense(out_dim, dtype=self.dtype, name="fc2")(h)


class ConvPositionalEmbedding(nn.Module):
    """wav2vec2-style grouped conv positional embedding.

    Reference analog: fairseq wav2vec2 TransformerEncoder pos_conv (used by
    AV-HuBERT, avhubert/hubert.py:399, and the SR predictor,
    src/sub_model/modules.py:130): Conv1d(k=conv_pos, groups=conv_pos_groups)
    + SamePad + GELU, weight-normalized in torch; here the kernel is stored
    directly (weight-norm folded at import).
    """

    kernel_size: int = 128
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        d = x.shape[-1]
        pos = nn.Conv(
            features=d,
            kernel_size=(self.kernel_size,),
            feature_group_count=self.groups,
            padding=[(self.kernel_size // 2, self.kernel_size // 2)],
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.kernel_size % 2 == 0:
            pos = pos[:, :-1]  # SamePad: drop trailing element for even kernels
        return nn.gelu(pos)


def sinusoidal_positions(n_pos: int, dim: int, base: float = 10000.0) -> np.ndarray:
    """Standard interleaved sin/cos table [n_pos, dim] (whisper-style: concat)."""
    half = dim // 2
    freq = np.exp(-math.log(base) * np.arange(half) / (half - 1 if half > 1 else 1))
    pos = np.arange(n_pos)[:, None] * freq[None, :]
    return np.concatenate([np.sin(pos), np.cos(pos)], axis=1).astype(np.float32)


class TransformerLayer(nn.Module):
    """Pre- or post-LN transformer encoder layer (fairseq-compatible)."""

    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    layer_norm_first: bool = True
    activation: Callable = nn.gelu
    sequence_parallel: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, kv_lens=None, mask=None, deterministic: bool = True):
        attn = lambda h: MultiHeadAttention(
            num_heads=self.num_heads,
            dropout=self.attention_dropout,
            sequence_parallel=self.sequence_parallel,
            dtype=self.dtype,
            name="self_attn",
        )(h, kv_lens=kv_lens, mask=mask, deterministic=deterministic)
        ffn = lambda h: FeedForward(
            hidden_dim=self.ffn_dim,
            activation=self.activation,
            dropout=self.activation_dropout,
            dtype=self.dtype,
            name="ffn",
        )(h, deterministic=deterministic)
        drop = lambda h: (
            nn.Dropout(rate=self.dropout)(h, deterministic=False)
            if self.dropout > 0 and not deterministic
            else h
        )
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="self_attn_layer_norm")
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")

        if self.layer_norm_first:
            x = x + drop(attn(ln1(x)))
            x = x + drop(ffn(ln2(x)))
        else:
            x = ln1(x + drop(attn(x)))
            x = ln2(x + drop(ffn(x)))
        return x


class TransformerEncoder(nn.Module):
    """Stack of TransformerLayers with conv positional embedding.

    Generic over the fairseq wav2vec2-style encoders in the reference
    (AV-HuBERT's 24-layer trunk, the SR predictor's 2-layer encoder).
    """

    num_layers: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    layer_norm_first: bool = True
    conv_pos: int = 128
    conv_pos_groups: int = 16
    layerdrop: float = 0.0
    # rematerialise layer activations in backward (checkpoint_activations.py)
    remat: bool = False
    # ring attention over the mesh sequence axis for long-form inputs
    sequence_parallel: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, *, lengths=None, deterministic: bool = True, output_layer=None
    ):
        """``output_layer=N`` returns the hidden state after the N-th layer
        (1-indexed) WITHOUT the final pre-LN LayerNorm — fairseq
        TransformerEncoder.extract_features(tgt_layer) semantics, used by the
        iteration-2 clustering feature dump
        (avhubert/clustering/dump_hubert_feature.py)."""
        if lengths is not None:
            x = x * (jnp.arange(x.shape[1])[None, :, None] < lengths[:, None, None]).astype(x.dtype)
        x = x + ConvPositionalEmbedding(
            kernel_size=self.conv_pos, groups=self.conv_pos_groups, dtype=self.dtype, name="pos_conv"
        )(x)
        # fairseq wav2vec2 TransformerEncoder: the outer LayerNorm runs before
        # the stack for post-LN models and after it for pre-LN models
        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")
        if not self.layer_norm_first:
            x = ln(x)
        if self.dropout > 0 and not deterministic:
            x = nn.Dropout(rate=self.dropout)(x, deterministic=False)
        layer_cls = nn.remat(TransformerLayer) if self.remat else TransformerLayer
        for i in range(self.num_layers):
            x = layer_cls(
                num_heads=self.num_heads,
                ffn_dim=self.ffn_dim,
                dropout=self.dropout,
                layer_norm_first=self.layer_norm_first,
                sequence_parallel=self.sequence_parallel,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, kv_lens=lengths, deterministic=deterministic)
            if output_layer is not None and i + 1 == output_layer:
                return x
        if self.layer_norm_first:
            x = ln(x)
        return x
