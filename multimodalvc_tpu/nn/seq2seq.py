"""Legacy encoder-decoder ASR head: transformer decoder over AV-HuBERT.

Reference: avhubert/decoder.py (TransformerDecoder used by AVHubertSeq2Seq,
avhubert/hubert_asr.py:430-521) + avhubert/sequence_generator.py (the
vendored fairseq beam search serving this path).  Decoding reuses
ops/beam_search.py — the same while-loop program that serves the LLaMA
path — through a functional self-attention KV cache.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from .layers import FeedForward, sinusoidal_positions


@dataclass
class Seq2SeqDecoderConfig:
    vocab_size: int = 1000
    d_model: int = 768
    num_layers: int = 6
    num_heads: int = 4
    ffn_dim: int = 3072
    dropout: float = 0.1
    max_positions: int = 1024
    eos_token_id: int = 2
    pad_token_id: int = 1

    @classmethod
    def tiny(cls, vocab_size: int = 64):
        return cls(vocab_size=vocab_size, d_model=32, num_layers=2, num_heads=2, ffn_dim=64)


class _DecoderLayer(nn.Module):
    cfg: Seq2SeqDecoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        enc: jnp.ndarray,  # [B, S, D]
        enc_lens: jnp.ndarray,  # [B]
        self_mask: jnp.ndarray,  # [B, 1, T, Tkv] bool
        cache: Optional[Dict[str, jnp.ndarray]] = None,
        cache_positions: Optional[jnp.ndarray] = None,  # [B, T]
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.d_model // cfg.num_heads

        def heads(y):
            return y.reshape(y.shape[0], y.shape[1], h, d).transpose(0, 2, 1, 3)

        def unheads(y):
            return y.transpose(0, 2, 1, 3).reshape(y.shape[0], y.shape[2], -1)

        # self attention (post-LN like fairseq's default decoder)
        res = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="self_attn_layer_norm")(x)
        q = heads(nn.Dense(cfg.d_model, dtype=self.dtype, name="self_q")(x))
        k = heads(nn.Dense(cfg.d_model, dtype=self.dtype, name="self_k")(x))
        v = heads(nn.Dense(cfg.d_model, dtype=self.dtype, name="self_v")(x))
        new_cache = None
        if cache is not None:
            # functional KV cache: write this block at the scalar write index
            idx = cache["index"]
            ck = jax.lax.dynamic_update_slice(
                cache["k"], k.transpose(0, 2, 1, 3), (0, idx, 0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cache["v"], v.transpose(0, 2, 1, 3), (0, idx, 0, 0)
            )
            new_cache = {"k": ck, "v": cv, "index": idx + x.shape[1]}
            k = ck.transpose(0, 2, 1, 3)
            v = cv.transpose(0, 2, 1, 3)
        attn = dot_product_attention(q, k, v, mask=self_mask)
        x = res + nn.Dense(cfg.d_model, dtype=self.dtype, name="self_out")(unheads(attn))

        # cross attention
        res = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="encoder_attn_layer_norm")(x)
        q = heads(nn.Dense(cfg.d_model, dtype=self.dtype, name="cross_q")(x))
        ek = heads(nn.Dense(cfg.d_model, dtype=self.dtype, name="cross_k")(enc))
        ev = heads(nn.Dense(cfg.d_model, dtype=self.dtype, name="cross_v")(enc))
        cross_mask = (
            jnp.arange(enc.shape[1])[None, None, None, :] < enc_lens[:, None, None, None]
        )
        attn = dot_product_attention(q, ek, ev, mask=cross_mask)
        x = res + nn.Dense(cfg.d_model, dtype=self.dtype, name="cross_out")(unheads(attn))

        # FFN
        res = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        x = res + FeedForward(hidden_dim=cfg.ffn_dim, dropout=cfg.dropout, dtype=self.dtype)(
            x, deterministic=deterministic
        )
        return x, new_cache


class Seq2SeqDecoder(nn.Module):
    """Transformer decoder with sinusoidal positions + tied output proj."""

    cfg: Seq2SeqDecoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = nn.Embed(
            self.cfg.vocab_size, self.cfg.d_model, dtype=self.dtype, name="embed_tokens"
        )
        self.layers = [
            _DecoderLayer(self.cfg, self.dtype, name=f"layers_{i}")
            for i in range(self.cfg.num_layers)
        ]
        self.out_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")
        self._pos = sinusoidal_positions(self.cfg.max_positions, self.cfg.d_model)

    def init_cache(self, batch: int, max_len: int) -> Tuple:
        h, d = self.cfg.num_heads, self.cfg.d_model // self.cfg.num_heads
        return tuple(
            {
                "k": jnp.zeros((batch, max_len, h, d), self.dtype),
                "v": jnp.zeros((batch, max_len, h, d), self.dtype),
                "index": jnp.zeros((), jnp.int32),
            }
            for _ in range(self.cfg.num_layers)
        )

    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, T]
        enc: jnp.ndarray,  # [B, S, D_enc] (pre-projected to d_model)
        enc_lens: jnp.ndarray,
        positions: Optional[jnp.ndarray] = None,  # [B, T]
        cache: Optional[Tuple] = None,
        cache_positions: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        b, t = tokens.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        x = self.embed(tokens) * np.sqrt(self.cfg.d_model)
        pos = jnp.asarray(self._pos, self.dtype)[positions]
        x = (x + pos).astype(self.dtype)

        if cache is not None:
            # decode step: attend over everything written so far
            kv_valid = jnp.arange(cache[0]["k"].shape[1])[None, None, None, :] <= (
                cache[0]["index"] + t - 1
            )
            self_mask = jnp.broadcast_to(
                kv_valid, (b, 1, t, cache[0]["k"].shape[1])
            )
        else:
            causal = jnp.tril(jnp.ones((t, t), bool))
            self_mask = jnp.broadcast_to(causal[None, None], (b, 1, t, t))

        new_caches = []
        for i, layer in enumerate(self.layers):
            x, new_c = layer(
                x,
                enc,
                enc_lens,
                self_mask,
                cache=cache[i] if cache is not None else None,
                cache_positions=cache_positions,
                deterministic=deterministic,
            )
            new_caches.append(new_c)
        x = self.out_norm(x)
        logits = jnp.einsum(
            "btd,vd->btv",
            x,
            self.embed.embedding.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return {"logits": logits, "cache": tuple(new_caches) if cache is not None else None}


def generate_seq2seq(
    decoder: Seq2SeqDecoder,
    variables: Any,
    enc: jnp.ndarray,
    enc_lens: jnp.ndarray,
    bos_token_id: int,
    max_new_tokens: int = 100,
    num_beams: int = 5,
    length_penalty: float = 1.0,
    constraints=None,  # packed [B, maxlen] (ops.constraints.pack_constraints)
    constraints_mode: str = "unordered",
):
    """SequenceGenerator analog over the shared while-loop beam search
    (avhubert/sequence_generator.py:20-986 in ~40 lines).  With
    ``constraints`` set, decodes through the lexically-constrained strategy
    (fairseq --constraints {unordered,ordered})."""
    from ..ops.beam_search import beam_search, constrained_beam_search

    cfg = decoder.cfg
    b = enc.shape[0]
    k = num_beams
    total = 1 + max_new_tokens

    cache = decoder.apply(
        variables, batch=b, max_len=total, method=Seq2SeqDecoder.init_cache
    )
    bos = jnp.full((b, 1), bos_token_id, jnp.int32)
    out = decoder.apply(
        variables,
        bos,
        enc,
        enc_lens,
        cache=cache,
        cache_positions=jnp.zeros((b, 1), jnp.int32),
    )
    first_logits = out["logits"][:, -1]

    enc_k = jnp.repeat(enc, k, axis=0)
    lens_k = jnp.repeat(enc_lens, k, axis=0)
    cache_k = jax.tree.map(
        lambda x: jnp.repeat(x, k, axis=0) if x.ndim > 0 else x, out["cache"]
    )

    def decode_fn(tokens, positions, cache):
        o = decoder.apply(
            variables,
            tokens,
            enc_k,
            lens_k,
            positions=positions,
            cache=cache,
            cache_positions=positions,
        )
        return o["logits"][:, -1], o["cache"]

    if constraints is not None:
        from ..ops import constraints as C

        build = C.build_unordered if constraints_mode == "unordered" else C.build_ordered
        return constrained_beam_search(
            decode_fn,
            cache_k,
            prompt_lengths=jnp.ones((b,), jnp.int32),
            first_logits=first_logits,
            eos_token_id=cfg.eos_token_id,
            pad_token_id=cfg.pad_token_id,
            max_new_tokens=max_new_tokens,
            constraint_set=build(np.asarray(constraints)),
            num_beams=k,
            length_penalty=length_penalty,
            mode=constraints_mode,
        )
    return beam_search(
        decode_fn,
        cache_k,
        prompt_lengths=jnp.ones((b,), jnp.int32),
        first_logits=first_logits,
        eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id,
        max_new_tokens=max_new_tokens,
        num_beams=k,
        length_penalty=length_penalty,
    )
