"""LLaMA decoder with LoRA adapters and a functional KV cache.

TPU re-design of the reference's HF LLaMA-3.2-3B path (reference:
src/model.py:231-252 — 4-bit NF4 + LoRA r=16 alpha=32 on q/k/v/o_proj;
forward with inputs_embeds at src/model.py:357-363).  Deviations, by design:

 * Precision: bf16 weights instead of NF4 4-bit — TPUs have no NF4 kernels;
   the MXU natively computes bf16 x bf16 -> fp32.  (int8 weight-only via AQT
   is the planned quantized option.)
 * LoRA lives in the same param tree under ``lora_a``/``lora_b`` leaf names;
   the trainer freezes everything else by path regex, mirroring the
   reference's freeze_params bookkeeping (src/model.py:159-160).
 * The KV cache is an explicit pytree threaded through calls (functional),
   sized statically for the decode budget, enabling ``lax.while_loop`` beam
   search instead of HF ``generate``.

Architecture: RMSNorm pre-norm, GQA attention with llama3-scaled RoPE,
SwiGLU MLP, tied embeddings (3.2-3B ties lm_head to embed_tokens).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention, flash_attention


@dataclass
class LoraConfig:
    rank: int = 16
    alpha: int = 32
    dropout: float = 0.05
    # which projections get adapters (reference: target_modules q.v.k.o)
    targets: Tuple[str, ...] = ("q_proj", "k_proj", "v_proj", "o_proj")


@dataclass
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 3072
    intermediate_size: int = 8192
    num_layers: int = 28
    num_heads: int = 24
    num_kv_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    # llama3 rope scaling (Llama-3.2 config.json)
    rope_scaling_factor: float = 32.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192
    tie_embeddings: bool = True
    lora: Optional[LoraConfig] = field(default_factory=LoraConfig)
    # rematerialise each decoder layer's activations in backward (HBM for
    # FLOPs; reference analog: modules/checkpoint_activations.py)
    remat: bool = False
    # Pallas flash kernel for the prefill/training self-attention.
    # None = auto: the single-kv-block flash schedule where it measured
    # faster than XLA fused attention (padded t >= 512 AND batch*t >= 4096 —
    # r5 v5e amortized A/B: [4,1024] 1.84x, [16,512] 1.52x, [32,512] 1.60x,
    # [48,512] 1.62x, [8,512] 1.36x), XLA everywhere else (short prompts:
    # [32,130] flash is 2x slower — XLA keeps the small score tiles in VMEM
    # and the kernel pays a GQA KV repeat; b=1 is a tie).  True forces the
    # kernel, False pins XLA.  bench.py records the 500-slot A/B every run
    # as a regression tripwire.
    use_flash_prefill: Optional[bool] = None
    # weight-only serving quantization: None (bf16), "int8" (per-channel
    # scales), or "int4" (group-128 scales, nibble-packed) — dense kernels
    # are dequantized in VMEM by the fused Pallas matmuls (ops/int8_matmul.py),
    # halving / quartering the HBM weight reads that bound decode.  Convert a
    # float tree with quantize_llama_params(params, mode); off for training.
    # Reference serves 4-bit NF4 via bitsandbytes (src/model.py:231-238);
    # int4-g128 is the TPU analog.
    weight_quant: Optional[str] = None

    @classmethod
    def llama32_3b(cls):
        return cls()

    @classmethod
    def tiny(cls, vocab_size: int = 256):  # for tests
        return cls(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=16,
        )


def llama3_rope_frequencies(cfg: LlamaConfig) -> np.ndarray:
    """Per-dimension inverse frequencies with llama3 NTK-by-parts scaling."""
    dim = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    if cfg.rope_scaling_factor and cfg.rope_scaling_factor != 1.0:
        low_wavelen = cfg.rope_original_max_position / cfg.rope_low_freq_factor
        high_wavelen = cfg.rope_original_max_position / cfg.rope_high_freq_factor
        wavelen = 2 * np.pi / inv_freq
        scaled = inv_freq / cfg.rope_scaling_factor
        smooth = (cfg.rope_original_max_position / wavelen - cfg.rope_low_freq_factor) / (
            cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
        )
        smoothed = (1 - smooth) * scaled + smooth * inv_freq
        inv_freq = np.where(wavelen > low_wavelen, scaled, inv_freq)
        mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
        inv_freq = np.where(mid, smoothed, inv_freq)
    return inv_freq.astype(np.float32)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, T, D], positions: [B, T] -> rotated x (HF half-split layout)."""
    angles = positions[:, :, None].astype(jnp.float32) * inv_freq[None, None, :]  # [B,T,D/2]
    cos = jnp.cos(angles)[:, None, :, :]
    sin = jnp.sin(angles)[:, None, :, :]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps)
        return (normed * scale.astype(jnp.float32)).astype(self.dtype)


class QuantDense(nn.Module):
    """Dense with quantized weights dequantized in VMEM by the fused Pallas
    matmuls (ops/int8_matmul.py).  mode="int8": int8 kernel + per-channel
    scales; mode="int4": nibble-packed kernel + group-128 scales.  Params are
    zero-inited — real values come from quantize_llama_params on a float
    tree."""

    features: int
    mode: str = "int8"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.int8_matmul import INT4_GROUP, int4_matmul, int8_matmul

        d_in = x.shape[-1]
        if self.mode == "int4":
            w_q = self.param(
                "w_packed", nn.initializers.zeros, (d_in // 2, self.features), jnp.int8
            )
            w_scale = self.param(
                "w_scale",
                nn.initializers.ones,
                (d_in // INT4_GROUP, self.features),
                jnp.float32,
            )
            return int4_matmul(x, w_q, w_scale, out_dtype=self.dtype)
        w_q = self.param(
            "w_q", nn.initializers.zeros, (d_in, self.features), jnp.int8
        )
        w_scale = self.param(
            "w_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        return int8_matmul(x, w_q, w_scale, out_dtype=self.dtype)


class LoraDense(nn.Module):
    """Dense with optional additive low-rank adapter: y = xW + s·(x A) B."""

    features: int
    use_bias: bool = False
    lora: Optional[LoraConfig] = None
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None  # int8/int4 base kernel (serving; LoRA stays float)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.quant:
            y = QuantDense(self.features, mode=self.quant, dtype=self.dtype, name="base_q")(x)
        else:
            y = nn.Dense(
                self.features, use_bias=self.use_bias, dtype=self.dtype, name="base"
            )(x)
        if self.lora is not None and self.lora.rank > 0:
            r = self.lora.rank
            a = self.param("lora_a", nn.initializers.he_uniform(), (x.shape[-1], r))
            b = self.param("lora_b", nn.initializers.zeros, (r, self.features))
            h = x
            if self.lora.dropout > 0 and not deterministic:
                h = nn.Dropout(rate=self.lora.dropout)(h, deterministic=False)
            y = y + (h @ a.astype(self.dtype)) @ b.astype(self.dtype) * (
                self.lora.alpha / r
            )
        return y


class LlamaAttention(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    def _flash_prefill_ok(
        self, t: int, tkv: int, head_dim: int, batch: int = 0
    ) -> bool:
        """Static gate for the Pallas flash self-attention path.

        Requires the window to be exactly the fresh sequence (t == tkv) with
        identity cache slots, so kernel row-index causality equals slot
        causality.  Callers with cache=None must use arange positions (the HF
        forward semantics LlamaModel defaults to) — custom position trees
        should set cfg.use_flash_prefill=False.
        """
        enabled = self.cfg.use_flash_prefill
        if enabled is None:
            # r5 v5e A/B (amortized, causal d=128): the single-kv-block flash
            # schedule (ops/attention.py) beats XLA fused attention 1.4-1.8x
            # once the prompt is long AND the work amortizes the kernel entry
            # — [4,1024] 1.84x, [16,512] 1.52x, [32,512] 1.60x, [48,512]
            # 1.62x, [8,512] 1.36x — ties at b=1 and LOSES at t <= 256
            # ([32,130] 0.50x, [48,180] 0.63x), so auto enables exactly the
            # measured win region; short serving prompts keep XLA
            t_padded = -(-t // 128) * 128
            enabled = t_padded >= 512 and batch * t >= 4096
        return bool(enabled) and t == tkv and t > 1 and head_dim % 64 == 0

    def _flash_self(self, q, k, v, attn_mask, rep: int):
        """Causal flash self-attention with the left-pad mask folded into a
        per-row [start, T) kv window (assemble_left_padded produces a
        contiguous suffix mask, models/avsr.py:239)."""
        t = q.shape[2]
        kf = jnp.repeat(k, rep, axis=1) if rep > 1 else k
        vf = jnp.repeat(v, rep, axis=1) if rep > 1 else v
        starts = None
        if attn_mask is not None:
            m = attn_mask[:, :t].astype(jnp.int32)
            starts = (t - jnp.sum(m, axis=-1)).astype(jnp.int32)
        return flash_attention(
            q.astype(self.dtype),
            kf.astype(self.dtype),
            vf.astype(self.dtype),
            kv_starts=starts,
            causal=True,
            scale=1.0 / math.sqrt(q.shape[-1]),
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        positions: jnp.ndarray,  # [B, T] RoPE positions
        attn_mask: Optional[jnp.ndarray],  # [B, Tkv] 1=valid (incl. cache)
        cache: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
        cache_positions: Optional[jnp.ndarray] = None,  # [B, T] slot ids
    ):
        cfg = self.cfg
        lora = cfg.lora
        in_lora = lambda name: lora if (lora and name in lora.targets) else None
        b, t, _ = x.shape
        h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        q = LoraDense(h * hd, lora=in_lora("q_proj"), dtype=self.dtype, quant=cfg.weight_quant, name="q_proj")(
            x, deterministic
        )
        k = LoraDense(hkv * hd, lora=in_lora("k_proj"), dtype=self.dtype, quant=cfg.weight_quant, name="k_proj")(
            x, deterministic
        )
        v = LoraDense(hkv * hd, lora=in_lora("v_proj"), dtype=self.dtype, quant=cfg.weight_quant, name="v_proj")(
            x, deterministic
        )
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, hkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, hkv, hd).transpose(0, 2, 1, 3)

        inv_freq = jnp.asarray(llama3_rope_frequencies(cfg))
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

        new_cache = None
        rep = h // hkv
        if cache is not None and "anc" in cache:
            # ancestry split cache: the gen segment is NEVER physically
            # reordered (saves the full read+write of ~1.8 GB/step plus the
            # while-loop carry copy-back of the gathered pallas outputs, r3
            # measurement); anc [B*K, L] maps each (row, slot) to the beam
            # row of the same batch element holding that slot's true KV and
            # the selection happens inside ops/decode_attention.py in VMEM.
            from ..ops.decode_attention import (
                gen_attention_ancestor,
                gen_attention_ancestor_ref,
                merge_softmax_segments,
                prompt_attention,
                prompt_attention_ref,
                quantize_kv,
            )

            assert t == 1, "ancestry decode is a single-token path"
            on_tpu = jax.default_backend() == "tpu"
            kv_q = cache["fixed_k"].dtype == jnp.int8
            idx = cache["index"]
            k_sl = k.transpose(0, 2, 1, 3)  # [B*K, 1, hkv, d]
            v_sl = v.transpose(0, 2, 1, 3)
            if kv_q:
                k_sl, k_sc = quantize_kv(k_sl)  # scales [B*K, 1, hkv]
                v_sl, v_sc = quantize_kv(v_sl)
                cks = jax.lax.dynamic_update_slice(
                    cache["fixed_ks"], k_sc, (0, idx, 0)
                )
                cvs = jax.lax.dynamic_update_slice(
                    cache["fixed_vs"], v_sc, (0, idx, 0)
                )
            ck = jax.lax.dynamic_update_slice(
                cache["fixed_k"], k_sl.astype(cache["fixed_k"].dtype), (0, idx, 0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cache["fixed_v"], v_sl.astype(cache["fixed_v"].dtype), (0, idx, 0, 0)
            )
            pk, pv = cache["prompt_k"], cache["prompt_v"]  # [B, hkv, Tp, d]
            nb, tp = pk.shape[0], pk.shape[2]
            kbeams = b // nb
            row_ids = (jnp.arange(b, dtype=jnp.int32) % kbeams)[:, None]
            anc = jax.lax.dynamic_update_slice(cache["anc"], row_ids, (0, idx))
            new_cache = {
                **cache, "fixed_k": ck, "fixed_v": cv, "anc": anc, "index": idx + t
            }
            if kv_q:
                new_cache["fixed_ks"], new_cache["fixed_vs"] = cks, cvs
            scale = 1.0 / math.sqrt(hd)
            q_flat = q[:, :, 0, :]  # [B*K, h, d]
            if kv_q:
                # int8 prompt KV: VMEM dequant inside the prompt kernel
                p_fn = prompt_attention if on_tpu else prompt_attention_ref
                out_p, m_p, l_p = p_fn(
                    q_flat.astype(self.dtype), pk, pv, cache["prompt_mask"],
                    beams=kbeams, scale=scale,
                    k_scale=cache["prompt_ks"], v_scale=cache["prompt_vs"],
                )
            else:
                # prompt segment partials (shared bf16 KV, XLA einsums)
                q_r = q.reshape(nb, kbeams, hkv, rep, t, hd)
                s_p = jnp.einsum(
                    "bkgrtd,bgpd->bkgrtp", q_r, pk.astype(self.dtype),
                    preferred_element_type=jnp.float32,
                ) * scale
                pmask = cache["prompt_mask"].astype(bool)
                s_p = jnp.where(pmask[:, None, None, None, None, :], s_p, -1e30)
                s_p = s_p.reshape(b, h, tp)  # t == 1 squeezed
                m_p = jnp.max(s_p, axis=-1)
                p_p = jnp.exp(s_p - m_p[..., None])
                l_p = jnp.sum(p_p, axis=-1)
                out_p = jnp.einsum(
                    "bkgrp,bgpd->bkgrd",
                    p_p.reshape(nb, kbeams, hkv, rep, tp).astype(self.dtype),
                    pv.astype(self.dtype),
                ).reshape(b, h, hd).astype(jnp.float32)
            # gen segment partials with in-kernel ancestry selection
            gen_fn = gen_attention_ancestor if on_tpu else gen_attention_ancestor_ref
            out_g, m_g, l_g = gen_fn(
                q_flat.astype(self.dtype), ck, cv, anc, idx + 1,
                beams=kbeams, scale=scale,
                k_scale=new_cache.get("fixed_ks"),
                v_scale=new_cache.get("fixed_vs"),
            )
            out = merge_softmax_segments(out_p, m_p, l_p, out_g, m_g, l_g)
            out = out.astype(self.dtype).reshape(b, t, h * hd)
            out = LoraDense(
                cfg.hidden_size, lora=in_lora("o_proj"), dtype=self.dtype,
                quant=cfg.weight_quant, name="o_proj"
            )(out, deterministic)
            return out, new_cache
        if cache is not None and "prompt_k" in cache:
            # split cache: the prompt KV is SHARED across beams ([B, ...])
            # while generated KV is per-beam — beam decode never re-reads K
            # copies of identical prompt keys, and beam reorder only gathers
            # the small generated segment.  The generated segment is stored
            # [B*K, L, hkv, d] — slots SECOND — because (a) XLA's preferred
            # physical layout for the attention einsums puts g*d minor (it
            # was inserting a {3,1,2,0} transpose copy, 291 ms/decode at
            # batch 48, between the default-layout Pallas beam gather and
            # the einsum when slots sat third), and (b) the beam gather
            # (ops/beam_gather.py) only needs rows on dim 0.
            # NEGATIVE RESULT (r3, v5e): fully slot-MAJOR ([L, B*K, hkv, d])
            # measured neutral back when the reorder was an XLA gather;
            # slots-second only pays off together with the Pallas gather.
            idx = cache["index"]
            k_sl = k.transpose(0, 2, 1, 3)  # [B*K, t, hkv, d]
            v_sl = v.transpose(0, 2, 1, 3)
            ck = jax.lax.dynamic_update_slice(
                cache["k"], k_sl.astype(cache["k"].dtype), (0, idx, 0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cache["v"], v_sl.astype(cache["v"].dtype), (0, idx, 0, 0)
            )
            new_cache = {**cache, "k": ck, "v": cv, "index": idx + t}
            pk, pv = cache["prompt_k"], cache["prompt_v"]  # [B, hkv, Tp, d]
            nb, tp = pk.shape[0], pk.shape[2]
            kbeams = b // nb
            scale = 1.0 / math.sqrt(hd)
            # GQA as grouped einsums: q reshaped to [.., hkv, rep, ..] dots
            # straight against the hkv-headed KV — a jnp.repeat here would
            # materialise rep x the entire cache in HBM EVERY decode step
            # (~1.5 GB/step at batch 8 x beam 5), which made decode scale
            # with rows instead of weight bandwidth.
            pk_c = pk.astype(self.dtype)
            pv_c = pv.astype(self.dtype)
            # prompt segment: q against shared keys, no per-beam copies
            q_r = q.reshape(nb, kbeams, hkv, rep, t, hd)
            s_p = jnp.einsum(
                "bkgrtd,bgpd->bkgrtp", q_r, pk_c, preferred_element_type=jnp.float32
            ) * scale
            pmask = cache["prompt_mask"].astype(bool)  # [B, Tp]
            s_p = jnp.where(pmask[:, None, None, None, None, :], s_p, -1e30)
            s_p = s_p.reshape(b, h, t, tp)
            # generated segment: per-beam, causal on write slots
            q_g = q.reshape(b, hkv, rep, t, hd)
            s_g = jnp.einsum(
                "Bgrtd,Blgd->Bgrtl", q_g, ck.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ) * scale
            tg = ck.shape[1]
            s_g = s_g.reshape(b, h, t, tg)
            gen_valid = jnp.arange(tg)[None, None, None, :] <= (idx + t - 1)
            s_g = jnp.where(gen_valid, s_g, -1e30)
            w = jax.nn.softmax(jnp.concatenate([s_p, s_g], axis=-1), axis=-1)
            w_p, w_g = w[..., :tp], w[..., tp:]
            out_p = jnp.einsum(
                "bkgrtp,bgpd->bkgrtd",
                w_p.reshape(nb, kbeams, hkv, rep, t, tp).astype(self.dtype),
                pv_c,
            ).reshape(b, h, t, hd)
            out_g = jnp.einsum(
                "Bgrtl,Blgd->Bgrtd",
                w_g.reshape(b, hkv, rep, t, tg).astype(self.dtype),
                cv.astype(self.dtype),
            ).reshape(b, h, t, hd)
            out = out_p + out_g
            out = out.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
            out = LoraDense(
                cfg.hidden_size, lora=in_lora("o_proj"), dtype=self.dtype,
                quant=cfg.weight_quant, name="o_proj"
            )(out, deterministic)
            return out, new_cache
        if cache is not None:
            idx = cache["index"]  # scalar int32: write offset
            ck = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), (0, 0, idx, 0))
            cv = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), (0, 0, idx, 0))
            new_cache = {"k": ck, "v": cv, "index": idx + t}
            if self._flash_prefill_ok(t, ck.shape[2], hd, batch=b):
                # generate prefill (cache spans exactly the prompt, slots are
                # identity): attend over the fresh k/v with the Pallas kernel
                out = self._flash_self(q, k, v, attn_mask, rep)
                out = out.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
                out = LoraDense(
                    cfg.hidden_size, lora=in_lora("o_proj"), dtype=self.dtype,
                    quant=cfg.weight_quant, name="o_proj"
                )(out, deterministic)
                return out, new_cache
            k, v = ck, cv
        elif cache_positions is None and self._flash_prefill_ok(t, k.shape[2], hd, batch=b):
            # training/validation forward (positions are arange, so causality
            # on slots == causality on row index): left-pad mask folds into a
            # per-row [start, T) window inside the kernel — the [T, T] score
            # matrix never hits HBM (TTFT-dominant prefill compute,
            # reference hot loop src/model.py:357-363)
            out = self._flash_self(q, k, v, attn_mask, rep)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
            out = LoraDense(
                cfg.hidden_size, lora=in_lora("o_proj"), dtype=self.dtype,
                quant=cfg.weight_quant, name="o_proj"
            )(out, deterministic)
            return out, new_cache
        tkv = k.shape[2]
        # causal mask over cache SLOT indices (left-padded rows have RoPE
        # position < slot id, so positions must not drive causality here)
        kv_ids = jnp.arange(tkv)[None, None, None, :]
        q_slots = cache_positions if cache_positions is not None else positions
        mask = kv_ids <= q_slots[:, None, :, None]
        if attn_mask is not None:
            mask = jnp.logical_and(mask, attn_mask[:, None, None, :].astype(bool))

        if rep == 1:
            out = dot_product_attention(q, k, v, mask=mask, scale=1.0 / math.sqrt(hd))
        else:
            # grouped GQA — no jnp.repeat: a repeated cache copy would cost
            # rep x the cache's HBM traffic every cached decode step
            qg = q.reshape(b, hkv, rep, t, hd)
            s = jnp.einsum(
                "bgrtd,bgld->bgrtl", qg, k, preferred_element_type=jnp.float32
            ) * (1.0 / math.sqrt(hd))
            s = jnp.where(mask[:, :, None, :, :], s, -1e30)
            w = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum("bgrtl,bgld->bgrtd", w.astype(self.dtype), v)
            out = out.reshape(b, h, t, hd)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
        out = LoraDense(
            cfg.hidden_size, lora=in_lora("o_proj"), dtype=self.dtype,
            quant=cfg.weight_quant, name="o_proj"
        )(out, deterministic)
        return out, new_cache


class LlamaMLP(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        if cfg.weight_quant:
            dense = lambda feats, name: QuantDense(
                feats, mode=cfg.weight_quant, dtype=self.dtype, name=name
            )
        else:
            dense = lambda feats, name: nn.Dense(
                feats, use_bias=False, dtype=self.dtype, name=name
            )
        gate = dense(cfg.intermediate_size, "gate_proj")(x)
        up = dense(cfg.intermediate_size, "up_proj")(x)
        h = nn.silu(gate) * up
        return dense(cfg.hidden_size, "down_proj")(h)


class LlamaLayer(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, attn_mask, cache=None, deterministic=True,
                 cache_positions=None):
        h = RMSNorm(self.cfg.rms_norm_eps, self.dtype, name="input_layernorm")(x)
        attn_out, new_cache = LlamaAttention(self.cfg, self.dtype, name="self_attn")(
            h, positions, attn_mask, cache, deterministic, cache_positions
        )
        x = x + attn_out
        h = RMSNorm(self.cfg.rms_norm_eps, self.dtype, name="post_attention_layernorm")(x)
        x = x + LlamaMLP(self.cfg, self.dtype, name="mlp")(h)
        return x, new_cache


class LlamaModel(nn.Module):
    """Decoder trunk. Accepts token ids or pre-built input embeddings."""

    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed_tokens = nn.Embed(
            self.cfg.vocab_size,
            self.cfg.hidden_size,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="embed_tokens",
        )
        layer_cls = (
            nn.remat(LlamaLayer, static_argnums=(5,)) if self.cfg.remat else LlamaLayer
        )
        self.layers = [
            layer_cls(self.cfg, self.dtype, name=f"layers_{i}")
            for i in range(self.cfg.num_layers)
        ]
        self.norm = RMSNorm(self.cfg.rms_norm_eps, self.dtype, name="norm")
        if self.cfg.weight_quant:
            # quantized copy of embed^T for the tied lm_head: the unembed
            # matmul re-reads the full [V, D] table every decode step (~788 MB
            # bf16 at 3B scale) — int8/int4 halves/quarters that traffic.
            # The float table stays for the (tiny) input gather.
            self.unembed_proj = QuantDense(
                self.cfg.vocab_size,
                mode=self.cfg.weight_quant,
                dtype=jnp.float32,
                name="unembed_q",
            )

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        # gather rows FIRST, then cast: flax's nn.Embed casts the whole
        # [V, D] table to the compute dtype before the take — a 1.6 GB
        # convert per decode step when table and compute dtypes differ
        # (profiled at 3.8 ms/step)
        table = self.embed_tokens.embedding
        return jnp.take(table, input_ids, axis=0).astype(self.dtype)

    def unembed(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Tied lm_head: hidden @ embed^T -> logits (fp32)."""
        if self.cfg.weight_quant:
            return self.unembed_proj(hidden)
        emb = self.embed_tokens.embedding
        return jnp.einsum(
            "btd,vd->btv", hidden, emb.astype(self.dtype), preferred_element_type=jnp.float32
        )

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,  # [B, Tkv] 1=valid
        positions: Optional[jnp.ndarray] = None,  # [B, T]
        cache: Optional[Tuple] = None,  # tuple of per-layer caches
        deterministic: bool = True,
        return_hidden: bool = False,
        cache_positions: Optional[jnp.ndarray] = None,
        compute_logits: bool = True,
        logits_last_only: bool = False,
    ):
        if inputs_embeds is None:
            inputs_embeds = self.embed(input_ids)
        x = inputs_embeds.astype(self.dtype)
        b, t = x.shape[:2]
        if positions is None:
            # HF forward semantics: absolute arange positions even for
            # left-padded batches (the reference trains exactly like this,
            # src/model.py:357-363).  Decode paths pass explicit positions
            # (HF generate uses mask-cumsum positions there).
            positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
        new_caches = []
        for i, layer in enumerate(self.layers):
            layer_cache = cache[i] if cache is not None else None
            x, new_c = layer(
                x, positions, attn_mask, layer_cache, deterministic, cache_positions
            )
            new_caches.append(new_c)
        x = self.norm(x)
        # the Speech head only needs hidden states — skip the [*, vocab]
        # unembed matmul entirely then (reference runs the LM head anyway;
        # here XLA never materialises it).  Prefill only consumes the FINAL
        # position's logits: logits_last_only avoids the [B, T, vocab] f32
        # buffer (~0.9 GB at batch 8 x 210 slots x 128k vocab).
        if not compute_logits:
            logits = None
        elif logits_last_only:
            logits = self.unembed(x[:, -1:])
        else:
            logits = self.unembed(x)
        out = {"logits": logits, "cache": tuple(new_caches) if cache is not None else None}
        if return_hidden:
            out["hidden"] = x
        return out

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16) -> Tuple:
        cfg = self.cfg
        shape = (batch, cfg.num_kv_heads, max_len, cfg.head_dim)
        return tuple(
            {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype), "index": jnp.zeros((), jnp.int32)}
            for _ in range(cfg.num_layers)
        )


def cross_entropy_lm_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = -100
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """HF-style causal LM loss: shift, mean over valid label tokens.

    Returns (loss, n_correct, n_valid) for accuracy reporting
    (reference: src/criterion.py:60-76).
    """
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_logp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.sum(valid)
    loss = -jnp.sum(jnp.where(valid, token_logp, 0.0)) / jnp.maximum(n_valid, 1)
    preds = jnp.argmax(shift_logits, axis=-1)
    n_correct = jnp.sum(jnp.logical_and(preds == shift_labels, valid))
    return loss, n_correct, n_valid


def generate_beam(
    model: "LlamaModel",
    variables: Any,
    inputs_embeds: jnp.ndarray,  # [B, T_prompt, D] left-padded
    attn_mask: jnp.ndarray,  # [B, T_prompt] 1=valid
    *,
    eos_token_id: int,
    pad_token_id: int,
    num_beams: int = 5,
    max_new_tokens: int = 100,
    length_penalty: float = 1.0,
    no_repeat_ngram_size: int = 0,
    cache_dtype=jnp.bfloat16,
    share_prompt_kv: bool = True,
    ancestry_reorder: bool = False,
    kv_quant: Optional[str] = None,  # "int8" (requires ancestry_reorder)
    constraints=None,  # ops.constraints.TrieArrays | SequenceArrays
    constraints_mode: str = "unordered",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HF-generate-equivalent beam search over embedded prompts.

    Replaces the reference's ``self.llama.generate(inputs_embeds=...,
    num_beams=5, ...)`` (src/model.py:478-485) with a fully jitted prefill +
    ``lax.while_loop`` decode.  Returns (sequences [B, K, max_new], scores).
    """
    from ..ops.beam_search import beam_search

    if kv_quant and not (ancestry_reorder and share_prompt_kv):
        raise ValueError("kv_quant requires ancestry_reorder (split cache)")

    # Ensemble support (reference: checkpoint_utils.load_model_ensemble_and_task
    # + fairseq EnsembleModel log-prob averaging, sequence_generator.py):
    # variables / inputs_embeds / attn_mask may be equal-length lists — each
    # member prefills its own prompt (prompt lengths may differ per member:
    # the SR predictor drives query counts) and the decode loop averages
    # normalized log-probs across members every step.
    ens_vars = list(variables) if isinstance(variables, (list, tuple)) else [variables]
    n_ens = len(ens_vars)
    ens_emb = (
        list(inputs_embeds)
        if isinstance(inputs_embeds, (list, tuple))
        else [inputs_embeds] * n_ens
    )
    ens_mask = (
        list(attn_mask) if isinstance(attn_mask, (list, tuple)) else [attn_mask] * n_ens
    )
    assert len(ens_emb) == n_ens and len(ens_mask) == n_ens

    def _prefill_member(variables, inputs_embeds, attn_mask):

        b, t_prompt, _ = inputs_embeds.shape
        k = num_beams
        total = t_prompt + max_new_tokens
        attn_mask = attn_mask.astype(jnp.int32)
        valid_lens = jnp.sum(attn_mask, axis=1)

        # --- prefill at batch B (beams share the prompt) ------------------------
        prefill_len = t_prompt if share_prompt_kv else total
        cache = model.apply(
            variables, method=LlamaModel.init_cache, batch=b, max_len=prefill_len, dtype=cache_dtype
        )
        rope_pos = jnp.maximum(jnp.cumsum(attn_mask, axis=1) - 1, 0)  # HF generate
        slot_pos = jnp.broadcast_to(jnp.arange(t_prompt)[None], (b, t_prompt))
        prefill_mask = attn_mask if share_prompt_kv else jnp.concatenate(
            [attn_mask, jnp.zeros((b, max_new_tokens), jnp.int32)], axis=1
        )
        out = model.apply(
            variables,
            inputs_embeds=inputs_embeds,
            attn_mask=prefill_mask,
            positions=rope_pos,
            cache=cache,
            cache_positions=slot_pos,
            logits_last_only=True,
        )
        first_logits = out["logits"][:, -1]  # [B, V]

        if share_prompt_kv:
            # split cache: prompt KV stays at batch B (shared across beams);
            # only the generated segment is per-beam.  Saves (K-1)/K of the
            # prompt-KV HBM reads per decode step and shrinks beam reordering
            # to the generated segment.
            cfg_m = model.cfg
            # slots-second layout: see the split-cache note in LlamaAttention
            gen_shape = (b * k, max_new_tokens, cfg_m.num_kv_heads, cfg_m.head_dim)
            if ancestry_reorder:
                # fixed_* leaves are skipped by the beam gather; the tiny anc
                # map is what gets reordered instead (see LlamaAttention's
                # ancestry branch / ops/decode_attention.py)
                def _anc_cache(c):
                    entry = {
                        "prompt_k": c["k"],
                        "prompt_v": c["v"],
                        "prompt_mask": attn_mask,
                        "fixed_k": jnp.zeros(gen_shape, cache_dtype),
                        "fixed_v": jnp.zeros(gen_shape, cache_dtype),
                        "anc": jnp.zeros((b * k, max_new_tokens), jnp.int32),
                        "index": jnp.zeros((), jnp.int32),
                    }
                    if kv_quant == "int8":
                        # int8 serving cache: prompt quantized once after
                        # prefill, gen slots quantized at write time; both
                        # dequantize in VMEM inside the decode kernels
                        from ..ops.decode_attention import quantize_kv

                        pk_q, pk_s = quantize_kv(c["k"])
                        pv_q, pv_s = quantize_kv(c["v"])
                        entry.update(
                            prompt_k=pk_q, prompt_v=pv_q,
                            prompt_ks=pk_s, prompt_vs=pv_s,
                            fixed_k=jnp.zeros(gen_shape, jnp.int8),
                            fixed_v=jnp.zeros(gen_shape, jnp.int8),
                            fixed_ks=jnp.zeros(gen_shape[:3], jnp.float32),
                            fixed_vs=jnp.zeros(gen_shape[:3], jnp.float32),
                        )
                    elif kv_quant:
                        raise ValueError(f"unsupported kv_quant {kv_quant!r}")
                    return entry

                cache_k = tuple(_anc_cache(c) for c in out["cache"])
            else:
                cache_k = tuple(
                    {
                        "prompt_k": c["k"],
                        "prompt_v": c["v"],
                        "prompt_mask": attn_mask,
                        "k": jnp.zeros(gen_shape, cache_dtype),
                        "v": jnp.zeros(gen_shape, cache_dtype),
                        "index": jnp.zeros((), jnp.int32),
                    }
                    for c in out["cache"]
                )

            def decode_fn(tokens, positions, cache):
                o = model.apply(
                    variables,
                    input_ids=tokens,
                    attn_mask=None,
                    positions=positions,
                    cache=cache,
                )
                return o["logits"][:, -1], o["cache"]
        else:
            # --- tile cache to beams ---------------------------------------------
            def tile(x):
                if x.ndim == 0:
                    return x
                return jnp.repeat(x, k, axis=0)

            cache_k = jax.tree.map(tile, out["cache"])
            prompt_mask_k = jnp.repeat(attn_mask, k, axis=0)  # [B*K, T_prompt]
            gen_slot_ids = jnp.arange(max_new_tokens)[None, :]

            def decode_fn(tokens, positions, cache):
                idx = cache[0]["index"]  # scalar: next write slot
                gen_mask = (gen_slot_ids <= idx - t_prompt).astype(jnp.int32)
                step_mask = jnp.concatenate(
                    [prompt_mask_k, jnp.broadcast_to(gen_mask, (b * k, max_new_tokens))], axis=1
                )
                slot = jnp.full((b * k, 1), idx, jnp.int32)
                o = model.apply(
                    variables,
                    input_ids=tokens,
                    attn_mask=step_mask,
                    positions=positions,
                    cache=cache,
                    cache_positions=slot,
                )
                return o["logits"][:, -1], o["cache"]


        return first_logits, cache_k, decode_fn, valid_lens

    members = [
        _prefill_member(v, e, m) for v, e, m in zip(ens_vars, ens_emb, ens_mask)
    ]
    k = num_beams
    if constraints is not None:
        # lexically-constrained transcription over the same prefilled cache
        # (fairseq --constraints; see ops/beam_search.constrained_beam_search)
        from ..ops.beam_search import constrained_beam_search

        if n_ens != 1:
            raise NotImplementedError("constrained decoding with ensembles")
        first_logits, cache_k, decode_fn, valid_lens = members[0]
        return constrained_beam_search(
            decode_fn,
            cache_k,
            prompt_lengths=valid_lens,
            first_logits=first_logits,
            eos_token_id=eos_token_id,
            pad_token_id=pad_token_id,
            max_new_tokens=max_new_tokens,
            constraint_set=constraints,
            num_beams=k,
            length_penalty=length_penalty,
            mode=constraints_mode,
        )
    if n_ens == 1:
        first_logits, cache_k, decode_fn, valid_lens = members[0]
        return beam_search(
            decode_fn,
            cache_k,
            prompt_lengths=valid_lens,
            first_logits=first_logits,
            eos_token_id=eos_token_id,
            pad_token_id=pad_token_id,
            max_new_tokens=max_new_tokens,
            num_beams=k,
            length_penalty=length_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size,
        )

    lens0 = members[0][3]
    first_lp = jnp.stack(
        [jax.nn.log_softmax(m[0].astype(jnp.float32), axis=-1) for m in members], axis=0
    )
    ens_first = jax.nn.logsumexp(first_lp, axis=0) - jnp.log(float(n_ens))

    def ens_decode(tokens, positions, caches):
        # positions arrive relative to member 0's prompt length; shift per
        # member, then average normalized log-probs (logsumexp - log n) —
        # beam_search's log_softmax is an identity on the normalized result
        logps, new_caches = [], []
        for mi, (_fl, _ck, dfn, lens) in enumerate(members):
            off = jnp.repeat(lens - lens0, k)[:, None]
            lg, nc = dfn(tokens, positions + off, caches[mi])
            logps.append(jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1))
            new_caches.append(nc)
        avg = jax.nn.logsumexp(jnp.stack(logps, axis=0), axis=0) - jnp.log(float(n_ens))
        return avg, tuple(new_caches)

    return beam_search(
        ens_decode,
        tuple(m[1] for m in members),
        prompt_lengths=lens0,
        first_logits=ens_first,
        eos_token_id=eos_token_id,
        pad_token_id=pad_token_id,
        max_new_tokens=max_new_tokens,
        num_beams=k,
        length_penalty=length_penalty,
        no_repeat_ngram_size=no_repeat_ngram_size,
    )


# ---------------------------------------------------------------------------
# HF weight import
# ---------------------------------------------------------------------------


def import_hf_llama(state: Dict[str, np.ndarray], cfg: LlamaConfig):
    """Map an HF LlamaModel/LlamaForCausalLM state dict onto LlamaModel params.

    LoRA adapters (if enabled) are freshly initialised: lora_b = 0 keeps the
    imported model exact at load (reference loads base + zero-init LoRA too).
    """
    def get(k):
        for p in ("", "model.", "base_model.model.model."):
            if p + k in state:
                return np.asarray(state[p + k])
        raise KeyError(k)

    def lin(src):
        return {"kernel": jnp.asarray(get(f"{src}.weight").T)}

    def lora_wrap(src, name):
        p = {"base": lin(src)}
        if cfg.lora and name in cfg.lora.targets:
            in_dim = p["base"]["kernel"].shape[0]
            out_dim = p["base"]["kernel"].shape[1]
            r = cfg.lora.rank
            rng = np.random.default_rng(0)
            bound = math.sqrt(6.0 / in_dim)
            p["lora_a"] = jnp.asarray(
                rng.uniform(-bound, bound, (in_dim, r)).astype(np.float32)
            )
            p["lora_b"] = jnp.zeros((r, out_dim), jnp.float32)
        return p

    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": jnp.asarray(get("embed_tokens.weight"))},
        "norm": {"scale": jnp.asarray(get("norm.weight"))},
    }
    for i in range(cfg.num_layers):
        src = f"layers.{i}"
        params[f"layers_{i}"] = {
            "input_layernorm": {"scale": jnp.asarray(get(f"{src}.input_layernorm.weight"))},
            "post_attention_layernorm": {
                "scale": jnp.asarray(get(f"{src}.post_attention_layernorm.weight"))
            },
            "self_attn": {
                "q_proj": lora_wrap(f"{src}.self_attn.q_proj", "q_proj"),
                "k_proj": lora_wrap(f"{src}.self_attn.k_proj", "k_proj"),
                "v_proj": lora_wrap(f"{src}.self_attn.v_proj", "v_proj"),
                "o_proj": lora_wrap(f"{src}.self_attn.o_proj", "o_proj"),
            },
            "mlp": {
                "gate_proj": lin(f"{src}.mlp.gate_proj"),
                "up_proj": lin(f"{src}.mlp.up_proj"),
                "down_proj": lin(f"{src}.mlp.down_proj"),
            },
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# Pipeline-parallel training forward
# ---------------------------------------------------------------------------


def stack_layer_params(params: Dict[str, Any], num_layers: int, n_stages: int) -> Any:
    """{layers_0..layers_{L-1}} -> stacked pytree with leading [P, L/P] axes
    for pipeline_apply (stage dim sharded over the mesh 'pipeline' axis)."""
    if num_layers % n_stages:
        raise ValueError(f"{num_layers} layers not divisible into {n_stages} stages")
    trees = [params[f"layers_{i}"] for i in range(num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    per = num_layers // n_stages
    return jax.tree.map(
        lambda v: v.reshape((n_stages, per) + v.shape[1:]), stacked
    )


def pipeline_lm_forward(
    cfg: LlamaConfig,
    variables: Any,
    inputs_embeds: jnp.ndarray,  # [B, T, D]
    attn_mask: Optional[jnp.ndarray],  # [B, T] 1=valid
    mesh,
    n_microbatches: int,
    dtype: jnp.dtype = jnp.float32,
    dropout_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Training forward with the decoder layers split over the mesh
    'pipeline' axis (GPipe schedule, parallel/pipeline.py) — the product
    wiring of pipeline parallelism (reference analog:
    fairseq/model_parallel/models/pipeline_parallel_transformer/ via torch
    Pipe).  Embedding/final-norm/unembed run replicated; each stage scans
    its L/P layers; positions/masks ride with their microbatch.  Returns
    fp32 logits [B, T, V].  Composes with data parallelism: the batch dim
    stays sharded over (data, fsdp).

    ``dropout_rng`` threads LoRA dropout through the pipeline stages (the
    reference fine-tunes with LoRA dropout 0.05, src/model.py:244-252): each
    stage folds (stage, microbatch, data-shard, layer) into the base key so
    every layer application gets an independent stream.  None = deterministic
    forward (validation / inference).
    """
    from ..parallel.pipeline import microbatch, pipeline_apply, unmicrobatch

    params = variables["params"]
    n_stages = mesh.shape["pipeline"]
    b, t, _ = inputs_embeds.shape
    if b % n_microbatches:
        raise ValueError(f"batch {b} not divisible by {n_microbatches} microbatches")
    x = inputs_embeds.astype(dtype)
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    mask = (
        attn_mask.astype(jnp.int32)
        if attn_mask is not None
        else jnp.ones((b, t), jnp.int32)
    )

    layer_mod = LlamaLayer(cfg, dtype)
    stacked = stack_layer_params(params, cfg.num_layers, n_stages)
    per_stage_layers = cfg.num_layers // n_stages

    def stage_fn(stage_params, h, c):
        if dropout_rng is None:
            def body(carry, lp):
                out, _ = layer_mod.apply(
                    {"params": lp}, carry, c["positions"], c["mask"]
                )
                return out, None

            h, _ = jax.lax.scan(body, h, stage_params)
            return h

        # independent dropout stream per (stage, microbatch, data shard,
        # layer): runs inside shard_map, so axis_index gives the position
        stage = jax.lax.axis_index("pipeline")
        shard = jax.lax.axis_index("data") * mesh.shape["fsdp"] + jax.lax.axis_index("fsdp")
        key = jax.random.fold_in(dropout_rng, stage)
        key = jax.random.fold_in(key, c["mb_id"][0])
        key = jax.random.fold_in(key, shard)

        def body(carry, xs):
            lp, li = xs
            out, _ = layer_mod.apply(
                {"params": lp}, carry, c["positions"], c["mask"],
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(key, li)},
            )
            return out, None

        h, _ = jax.lax.scan(body, h, (stage_params, jnp.arange(per_stage_layers)))
        return h

    xm = microbatch(x, n_microbatches)
    mb_rows = b // n_microbatches
    consts = {
        "positions": microbatch(positions, n_microbatches),
        "mask": microbatch(mask, n_microbatches),
    }
    if dropout_rng is not None:
        consts["mb_id"] = jnp.broadcast_to(
            jnp.arange(n_microbatches, dtype=jnp.int32)[:, None],
            (n_microbatches, mb_rows),
        )
    h = pipeline_apply(
        stage_fn, stacked, xm, mesh, consts=consts, batch_axes=("data", "fsdp")
    )
    h = unmicrobatch(h)
    h = RMSNorm(cfg.rms_norm_eps, dtype).apply({"params": params["norm"]}, h)
    emb = params["embed_tokens"]["embedding"]
    return jnp.einsum(
        "btd,vd->btv", h, emb.astype(dtype), preferred_element_type=jnp.float32
    )


def quantize_llama_params(params: Dict[str, Any], mode: str = "int8") -> Dict[str, Any]:
    """Float LLaMA param tree -> weight-quantized serving layout.

    mode="int8": every attention projection's base kernel and every MLP
    kernel becomes {w_q int8, w_scale f32} (per-output-channel symmetric).
    mode="int4": {w_packed int8 (two nibbles/byte), w_scale [groups, d_out]}
    (symmetric group-128 — the TPU analog of the reference's NF4 4-bit,
    src/model.py:231-238).  LoRA adapters, norms and embeddings stay float.
    Shapes/locations match what QuantDense declares, so the converted tree
    drops straight into LlamaModel(cfg with weight_quant=mode).apply.
    """
    from ..ops.int8_matmul import quantize_kernel, quantize_kernel_int4

    def q(node):
        if mode == "int4":
            w_p, scale = quantize_kernel_int4(node["kernel"])
            return {"w_packed": w_p, "w_scale": scale}
        w_q, scale = quantize_kernel(node["kernel"])
        return {"w_q": w_q, "w_scale": scale}

    out: Dict[str, Any] = {}
    # tied-lm-head copy: quantized embed^T for the unembed matmul.  The table
    # kept for the input gather drops to bf16: embed() casts the gathered rows
    # to the (bf16) compute dtype anyway, so a bf16 table is bit-identical on
    # the serving path and halves the table's 1.6 GB fp32 HBM footprint.
    emb_f = jnp.asarray(params["embed_tokens"]["embedding"])
    out["unembed_q"] = q({"kernel": emb_f.T})
    for k, v in params.items():
        if k == "embed_tokens":
            out[k] = {**v, "embedding": emb_f.astype(jnp.bfloat16)}
            continue
        if not k.startswith("layers_"):
            out[k] = v
            continue
        layer = dict(v)
        sa = dict(layer["self_attn"])
        for pn in ("q_proj", "k_proj", "v_proj", "o_proj"):
            node = dict(sa[pn])
            node["base_q"] = q(node.pop("base"))
            sa[pn] = node
        layer["self_attn"] = sa
        mlp = dict(layer["mlp"])
        for pn in ("gate_proj", "up_proj", "down_proj"):
            mlp[pn] = q(mlp[pn])
        layer["mlp"] = mlp
        out[k] = layer
    return out
