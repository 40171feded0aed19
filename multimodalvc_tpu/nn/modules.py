"""Small product sub-modules: projector, speech-rate predictor, fusion.

Reference analogs in src/sub_model/modules.py:
 * Projector (:59-72)            — two stacked Linears, no activation.
 * Multimodal_Attention (:74-90) — 2x cross-MHA for the 'cross-att' fusion.
 * Speech_Rate_Predictor (:108-142) — 256-d wav2vec2-style transformer with a
   learnable SR token and a ReLU regression head; loaded frozen.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import MultiHeadAttention, TransformerEncoder


class Projector(nn.Module):
    """Two linear layers, no nonlinearity (src/sub_model/modules.py:59-72)."""

    hidden_dim: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="layers_0")(x)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="layers_1")(x)


class MultimodalAttention(nn.Module):
    """'cross-att' fusion: video queries attend to audio twice
    (src/sub_model/modules.py:74-90)."""

    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray, video: jnp.ndarray, *, kv_lens=None):
        x = MultiHeadAttention(num_heads=self.num_heads, dtype=self.dtype, name="mha0")(
            video, audio, kv_lens=kv_lens
        )
        x = x + audio
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        x2 = MultiHeadAttention(num_heads=self.num_heads, dtype=self.dtype, name="mha1")(
            video, audio, kv_lens=kv_lens
        )
        return x + x2


class SpeechRatePredictor(nn.Module):
    """Whisper features (subsampled 4x) -> scalar speech-rate factor.

    Matches src/sub_model/modules.py:108-142: Linear 1024->256, learnable SR
    token prepended, 2-layer wav2vec2 TransformerEncoder (layer_norm_first,
    ffn 1024, 4 heads, conv_pos 128/16), Linear 256->1 + ReLU on the token.
    """

    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, lengths=None, deterministic: bool = True):
        b = x.shape[0]
        x = nn.Dense(256, dtype=self.dtype, name="linear")(x)
        sr_token = self.param("sr_token", nn.initializers.xavier_uniform(), (1, 1, 256))
        x = jnp.concatenate([jnp.broadcast_to(sr_token, (b, 1, 256)).astype(x.dtype), x], axis=1)
        if lengths is not None:
            lengths = lengths + 1  # account for the prepended token
        x = TransformerEncoder(
            num_layers=self.num_layers,
            num_heads=4,
            ffn_dim=1024,
            layer_norm_first=True,
            dtype=self.dtype,
            name="encoder",
        )(x, lengths=lengths, deterministic=deterministic)
        out = nn.Dense(1, dtype=self.dtype, name="sr_predictor")(x[:, 0, :])
        return nn.relu(out)
