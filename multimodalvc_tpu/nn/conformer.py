"""Conformer encoder for the speech-synthesis head.

TPU re-design of the reference's ESPnet-lineage conformer
(reference: src/divise_conformer/encoder.py:279-317, encoder_layer.py:53-149,
convolution.py:14-66, embedding.py PositionalEncoding).  The reference's "L"
configuration — 12 blocks, 512-d, 8 heads, macaron FFN (x0.5), plain MHA with
absolute sinusoidal positions (xscale = sqrt(d)), conv module k=31 with
BatchNorm+Swish — is reproduced exactly so its checkpoints map 1:1; the
attention runs through the shared fp32-softmax/flash path and all convs are
NWC so XLA keeps everything on MXU/VPU without transposes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import MultiHeadAttention


@dataclass
class ConformerConfig:
    num_blocks: int = 12
    attention_dim: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    dropout_rate: float = 0.1
    cnn_kernel: int = 31
    macaron: bool = True
    normalize_before: bool = True
    # expert-parallel MoE FFN: when > 1 the block's final feed-forward becomes
    # a BASE-style expert bank routed with Sinkhorn balancing, sharded over
    # the mesh "expert" axis (reference analog: fairseq base_layer.py + the
    # C++ balanced_assignment auction).  0/1 keeps the dense reference FFN
    # and exact checkpoint interop.
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    # conv-module kernel: depthwise (reference parity) | lightweight |
    # dynamic (fairseq lightconv/dynamicconv equivalents, ops/dynamic_conv.py)
    conv_type: str = "depthwise"

    @classmethod
    def sized(cls, size: str, **overrides) -> "ConformerConfig":
        """S/M/L lookup (reference: src/divise_conformer/encoder.py:281-299)."""
        table = {
            "S": dict(num_blocks=3, attention_dim=144, attention_heads=4),
            "M": dict(num_blocks=4, attention_dim=256, attention_heads=4),
            "L": dict(num_blocks=12, attention_dim=512, attention_heads=8),
        }
        return cls(**{**table[size], **overrides})


def espnet_positional_encoding(n_pos: int, dim: int) -> np.ndarray:
    """Interleaved sin/cos table, pe[:, 0::2]=sin (embedding.py:60-75)."""
    pos = np.arange(n_pos, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(np.log(10000.0) / dim))
    pe = np.zeros((n_pos, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class ConformerConvModule(nn.Module):
    """pointwise -> GLU -> conv(k) -> BN -> swish -> pointwise.

    conv_type selects the kernel: "depthwise" (reference parity,
    src/divise_conformer/convolution.py), "lightweight" (tied per-head
    softmax weights) or "dynamic" (position-predicted weights) — the TPU
    ports of fairseq's lightconv/dynamicconv CUDA kernels
    (ops/dynamic_conv.py) as drop-in conv-module variants.
    """

    kernel_size: int = 31
    dtype: jnp.dtype = jnp.float32
    conv_type: str = "depthwise"
    conv_heads: int = 8

    @nn.compact
    def __call__(self, x, deterministic: bool = True, frame_mask=None):
        from ..ops.dynamic_conv import dynamic_conv, lightweight_conv

        d = x.shape[-1]
        h = nn.Dense(2 * d, dtype=self.dtype, name="pointwise_conv1")(x)
        h = nn.glu(h, axis=-1)
        if frame_mask is not None:
            # static padded buffers: frames beyond the valid length hold LN'd
            # projection-bias garbage, and the time-mixing conv would leak it
            # up to (k-1)/2 frames into the valid region.  The reference runs
            # on exact-length tensors where torch zero-pads the conv
            # (convolution.py:14-66), so the conv input at padded slots must
            # be exactly zero for activation parity.
            h = h * frame_mask.astype(h.dtype)
        pad = (self.kernel_size - 1) // 2
        if self.conv_type == "lightweight":
            w = self.param(
                "light_weights", nn.initializers.normal(0.02),
                (self.conv_heads, self.kernel_size),
            )
            h = lightweight_conv(h, w.astype(self.dtype), padding_left=pad)
        elif self.conv_type == "dynamic":
            w = nn.Dense(
                self.conv_heads * self.kernel_size, dtype=self.dtype,
                name="weight_predictor",
            )(h)
            w = w.reshape(h.shape[0], h.shape[1], self.conv_heads, self.kernel_size)
            h = dynamic_conv(h, w, padding_left=pad)
        else:
            h = nn.Conv(
                features=d,
                kernel_size=(self.kernel_size,),
                feature_group_count=d,
                padding=[(pad, pad)],
                dtype=self.dtype,
                name="depthwise_conv",
            )(h)
        h = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, dtype=self.dtype, name="norm"
        )(h)
        h = h * nn.sigmoid(h)  # swish
        return nn.Dense(d, dtype=self.dtype, name="pointwise_conv2")(h)


class PositionwiseFF(nn.Module):
    hidden: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="w_1")(x)
        h = nn.relu(h)
        if self.dropout > 0 and not deterministic:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="w_2")(h)


class ConformerBlock(nn.Module):
    cfg: ConformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, lengths=None, deterministic: bool = True):
        cfg = self.cfg

        def drop(h):
            if cfg.dropout_rate > 0 and not deterministic:
                return nn.Dropout(rate=cfg.dropout_rate)(h, deterministic=False)
            return h

        if cfg.macaron:
            h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm_ff_macaron")(x)
            x = x + 0.5 * drop(
                PositionwiseFF(cfg.linear_units, cfg.dropout_rate, self.dtype, name="ff_macaron")(
                    h, deterministic
                )
            )
        h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm_mha")(x)
        x = x + drop(
            MultiHeadAttention(
                num_heads=cfg.attention_heads,
                dropout=cfg.dropout_rate,
                dtype=self.dtype,
                name="self_attn",
            )(h, kv_lens=lengths, deterministic=deterministic)
        )
        h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm_conv")(x)
        frame_mask = None
        if lengths is not None:
            frame_mask = (
                jnp.arange(x.shape[1])[None, :, None] < lengths[:, None, None]
            )
        x = x + drop(
            ConformerConvModule(
                cfg.cnn_kernel, self.dtype, conv_type=cfg.conv_type,
                conv_heads=cfg.attention_heads, name="conv_module",
            )(h, deterministic, frame_mask=frame_mask)
        )
        h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm_ff")(x)
        if cfg.moe_experts > 1:
            from ..parallel.expert import BaseMoELayer

            ff_out = BaseMoELayer(
                num_experts=cfg.moe_experts,
                ffn_dim=cfg.linear_units,
                capacity_factor=cfg.moe_capacity_factor,
                dtype=self.dtype,
                name="ff_moe",
            )(h, deterministic)
        else:
            ff_out = PositionwiseFF(
                cfg.linear_units, cfg.dropout_rate, self.dtype, name="ff"
            )(h, deterministic)
        x = x + 0.5 * drop(ff_out)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm_final")(x)


class ConformerEncoder(nn.Module):
    """[B, T, D_in] -> [B, T, attention_dim] (input proj only if dims differ)."""

    cfg: ConformerConfig
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, lengths=None, deterministic: bool = True):
        cfg = self.cfg
        d = cfg.attention_dim
        if x.shape[-1] != d:
            x = nn.Dense(d, dtype=self.dtype, name="input_proj")(x)
        t = x.shape[1]
        pe = jnp.asarray(espnet_positional_encoding(max(t, 1), d))
        x = x * jnp.asarray(np.sqrt(d), dtype=x.dtype) + pe[None, :t]
        if cfg.dropout_rate > 0 and not deterministic:
            x = nn.Dropout(rate=cfg.dropout_rate)(x, deterministic=False)
        for i in range(cfg.num_blocks):
            x = ConformerBlock(cfg, self.dtype, name=f"blocks_{i}")(
                x, lengths=lengths, deterministic=deterministic
            )
        if cfg.normalize_before:
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="after_norm")(x)
        return x
