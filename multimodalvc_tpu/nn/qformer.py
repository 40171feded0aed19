"""Q-Former: query-token compressor with per-layer cross-attention.

TPU re-design of the reference's vendored BLIP-2/LAVIS BERT
(reference: src/sub_model/Qformer.py:52-1216, configured at
src/model.py:121-132: bert-large base config with num_hidden_layers=2,
hidden 1024, heads 16, intermediate 4096, cross_attention_freq=1,
query-only input).  Only the query path is implemented — the reference never
feeds text through it — which reduces each layer to:

  x = LN(x + SelfAttn(x))          (post-LN, BERT style, eps 1e-12)
  x = LN(x + CrossAttn(x, enc))    (every layer; cross_attention_freq=1)
  x = LN(x + FFN_query(x))         (BLIP-2's separate query FFN)

Everything is static-shape: query slots are fixed at max_queries and masked
per-sample, replacing the reference's dynamic max(len_queries) slicing
(src/model.py:584-619) so one XLA program serves all batches.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import MultiHeadAttention


@dataclass
class QFormerConfig:
    num_layers: int = 2
    hidden_size: int = 1024
    num_heads: int = 16
    intermediate_size: int = 4096
    encoder_width: int = 2048  # fused AV feature dim (concat: 1024+1024)
    max_queries: int = 80  # queries_per_sec * 20 (src/model.py:117-119)
    dropout: float = 0.1
    layer_norm_eps: float = 1e-12


class QFormerLayer(nn.Module):
    cfg: QFormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, Q, D] query states
        enc: jnp.ndarray,  # [B, T, D_enc] encoder (AV) states
        *,
        query_lens: Optional[jnp.ndarray] = None,  # [B]
        enc_lens: Optional[jnp.ndarray] = None,  # [B]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name=name)
        h = MultiHeadAttention(
            num_heads=cfg.num_heads,
            dropout=cfg.dropout,
            dtype=self.dtype,
            name="self_attn",
        )(x, kv_lens=query_lens, deterministic=deterministic)
        x = ln("self_ln")(x + h)
        h = MultiHeadAttention(
            num_heads=cfg.num_heads,
            dropout=cfg.dropout,
            dtype=self.dtype,
            name="cross_attn",
        )(x, enc, kv_lens=enc_lens, deterministic=deterministic)
        x = ln("cross_ln")(x + h)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate_query")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output_query")(h)
        if cfg.dropout > 0 and not deterministic:
            h = nn.Dropout(rate=cfg.dropout)(h, deterministic=False)
        return ln("ffn_ln")(x + h)


class QFormer(nn.Module):
    """Learned query tokens cross-attending to fused AV features.

    Returns [B, max_queries, hidden]; slots past query_lens[b] are zeroed.
    """

    cfg: QFormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        enc: jnp.ndarray,  # [B, T, D_enc]
        *,
        query_lens: Optional[jnp.ndarray] = None,
        enc_lens: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b = enc.shape[0]
        query_tokens = self.param(
            "query_tokens",
            nn.initializers.normal(stddev=0.02),
            (1, cfg.max_queries, cfg.hidden_size),
        )
        x = jnp.broadcast_to(query_tokens, (b, cfg.max_queries, cfg.hidden_size)).astype(
            self.dtype
        )
        # BLIP-2 applies the embedding LayerNorm + dropout to query tokens
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="embeddings_ln")(x)
        if cfg.dropout > 0 and not deterministic:
            x = nn.Dropout(rate=cfg.dropout)(x, deterministic=False)
        for i in range(cfg.num_layers):
            x = QFormerLayer(cfg, self.dtype, name=f"layers_{i}")(
                x,
                enc,
                query_lens=query_lens,
                enc_lens=enc_lens,
                deterministic=deterministic,
            )
        if query_lens is not None:
            valid = jnp.arange(cfg.max_queries)[None, :, None] < query_lens[:, None, None]
            x = jnp.where(valid, x, jnp.zeros((), x.dtype))
        return x
