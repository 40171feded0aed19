"""Whisper audio encoder (the frozen acoustic front end).

TPU re-implementation of the encoder the reference takes from HF
(reference: src/model.py:228 —
``WhisperForConditionalGeneration.from_pretrained("openai/whisper-medium").model.encoder``,
wrapped at src/sub_model/modules.py:32-57): two GELU convs (k=3, second
stride 2) over the 80-bin log-mel, fixed sinusoidal positions, pre-LN
transformer stack, final LayerNorm.  whisper-medium: 24 layers, d=1024,
16 heads, ffn 4096, 1500 output frames at 50 Hz.

``import_hf_whisper_encoder`` maps an HF state dict onto this module
(parity-tested against a randomly-initialised HF WhisperEncoder in
tests/test_whisper.py, which is exactly how the published weights load).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import FeedForward, MultiHeadAttention, sinusoidal_positions


@dataclass
class WhisperEncoderConfig:
    n_mels: int = 80
    d_model: int = 1024  # whisper-medium
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    max_frames: int = 1500

    @classmethod
    def medium(cls):
        return cls()

    @classmethod
    def tiny(cls):  # whisper-tiny, for tests
        return cls(d_model=384, num_layers=4, num_heads=6, ffn_dim=1536)


class WhisperEncoderLayer(nn.Module):
    cfg: WhisperEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, lengths=None, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="self_attn_layer_norm")(x)
        # HF Whisper: k_proj has no bias
        h = WhisperAttention(self.cfg.num_heads, dtype=self.dtype, name="self_attn")(
            h, kv_lens=lengths
        )
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        h = FeedForward(self.cfg.ffn_dim, dtype=self.dtype, name="ffn")(h, deterministic)
        return x + h


class WhisperAttention(nn.Module):
    """MHA with bias on q/v/out but not k (HF Whisper convention)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, kv_lens=None):
        from ..ops.attention import dot_product_attention, flash_attention
        from .layers import use_flash

        d = x.shape[-1]
        head_dim = d // self.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        b, t = x.shape[:2]
        split = lambda z: z.reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        if use_flash(t, t, head_dim):
            out = flash_attention(q, k, v, kv_lens=kv_lens)
        else:
            mask = None
            if kv_lens is not None:
                mask = jnp.arange(t)[None, None, None, :] < kv_lens[:, None, None, None]
            out = dot_product_attention(q, k, v, mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class WhisperEncoder(nn.Module):
    """[B, n_mels, 2*max_frames] log-mel -> [B, max_frames, d_model] at 50 Hz."""

    cfg: WhisperEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, *, lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        cfg = self.cfg
        x = jnp.swapaxes(mel, -1, -2)  # [B, T, n_mels]
        x = nn.Conv(cfg.d_model, (3,), padding=[(1, 1)], dtype=self.dtype, name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            cfg.d_model, (3,), strides=(2,), padding=[(1, 1)], dtype=self.dtype, name="conv2"
        )(x)
        x = nn.gelu(x, approximate=False)
        t = x.shape[1]
        pos = jnp.asarray(sinusoidal_positions(cfg.max_frames, cfg.d_model))
        x = x + pos[None, :t].astype(x.dtype)
        out_lengths = None if lengths is None else (lengths + 1) // 2
        # Pad the sequence ONCE to the flash kernel's block multiple: 1500 is
        # not 8-divisible, so the Pallas kernel would otherwise pad+copy
        # q/k/v in every layer (measured 21 ms of a 151 ms whisper-medium
        # call at batch 8).  Padded rows are masked out of attention via
        # lengths and sliced off at the end; LN/FFN on them is dead lanes.
        t_pad = -(-t // 512) * 512 if t >= 512 else t
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
            out_lengths = (
                jnp.full((x.shape[0],), t, jnp.int32)
                if out_lengths is None
                else out_lengths
            )
        for i in range(cfg.num_layers):
            x = WhisperEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(
                x, lengths=out_lengths, deterministic=deterministic
            )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        return x[:, :t]


# ---------------------------------------------------------------------------
# HF weight import
# ---------------------------------------------------------------------------


def import_hf_whisper_encoder(state: Dict[str, np.ndarray], cfg: WhisperEncoderConfig):
    """Map HF WhisperEncoder state-dict keys onto this module's params.

    Accepts keys with or without the 'model.encoder.' prefix.
    """
    def get(k):
        for p in ("", "model.encoder.", "encoder."):
            if p + k in state:
                return np.asarray(state[p + k])
        raise KeyError(k)

    def linear(src, bias=True):
        p = {"kernel": jnp.asarray(get(f"{src}.weight").T)}
        if bias:
            p["bias"] = jnp.asarray(get(f"{src}.bias"))
        return p

    def ln(src):
        return {"scale": jnp.asarray(get(f"{src}.weight")), "bias": jnp.asarray(get(f"{src}.bias"))}

    params: Dict[str, dict] = {
        # torch conv1d [O, I, K] -> flax [K, I, O]
        "conv1": {
            "kernel": jnp.asarray(get("conv1.weight").transpose(2, 1, 0)),
            "bias": jnp.asarray(get("conv1.bias")),
        },
        "conv2": {
            "kernel": jnp.asarray(get("conv2.weight").transpose(2, 1, 0)),
            "bias": jnp.asarray(get("conv2.bias")),
        },
        "layer_norm": ln("layer_norm"),
    }
    for i in range(cfg.num_layers):
        src = f"layers.{i}"
        params[f"layers_{i}"] = {
            "self_attn_layer_norm": ln(f"{src}.self_attn_layer_norm"),
            "self_attn": {
                "q_proj": linear(f"{src}.self_attn.q_proj"),
                "k_proj": linear(f"{src}.self_attn.k_proj", bias=False),
                "v_proj": linear(f"{src}.self_attn.v_proj"),
                "out_proj": linear(f"{src}.self_attn.out_proj"),
            },
            "final_layer_norm": ln(f"{src}.final_layer_norm"),
            "ffn": {
                "fc1": linear(f"{src}.fc1"),
                "fc2": linear(f"{src}.fc2"),
            },
        }
    return {"params": params}
