"""Speech-synthesis model family: LLM-conditioned, NoLLM, and E2E (GAN).

Reference models re-designed TPU-first:
 * MMS_LLaMA_Speech (src/modelSpeech.py:22-333): AVSR front end, LLaMA run
   WITHOUT its LM head, per-sample slice of the query-token hidden states,
   3072->768 proj, per-sample linear resize to mel frame counts
   (floor(samples/160)), 768->512 proj, Conformer-L, 512->128 mel head.
 * MMS_Speech_NoLLM (src/modelSpeechNoLLM.py:33-491): drops the LLM; the
   Q-Former output feeds the head directly (1024->768), with LayerNorms
   ln1/ln2/ln3 between stages and batch-level modality dropout that swaps an
   entire encoder stream for a learned mask embedding (:312-322).
 * MMS_Speech_NoLLM_E2E (src/modelSpeechNoLLM_E2E.py:45-427): NoLLM trunk
   whose Conformer output (512) enters a HiFi-GAN upsampling stack through a
   weight-normed 512->512 conv_pre adapter, emitting waveforms directly.

Dynamic-shape surgery from the reference (hidden-state slicing at
:220-238, per-sample F.interpolate at :300-311) is replaced by gathers and
linear_resize_batched over static buffers.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_model
from ..nn.conformer import ConformerConfig, ConformerEncoder
from ..nn.hifigan import HifiGanConfig, HifiGanGenerator
from ..nn.llama import LlamaModel
from ..ops.interpolate import length_mask, linear_resize_batched
from .avsr import AVSRConfig, AVSREncoder, AVSRModel, assemble_left_padded

MEL_BINS = 128
HOP = 160


@dataclass
class SpeechConfig(AVSRConfig):
    conformer_size: str = "L"
    # > 1 swaps each Conformer block's final FFN for an expert-parallel
    # BASE-style MoE bank (mesh "expert" axis); 0 = dense reference parity
    conformer_moe_experts: int = 0
    proj_mid_dim: int = 768
    head_dim: int = 512
    max_mel_frames: int = 2400  # 24 s at 100 Hz
    # NoLLM modality dropout (src/modelSpeechNoLLM.py:169-171)
    p_modality_av: float = 0.5
    p_modality_video_only: float = 0.25
    p_modality_audio_only: float = 0.25

    @classmethod
    def tiny(cls):
        base = AVSRConfig.tiny()
        return cls(
            whisper=base.whisper,
            avhubert=base.avhubert,
            llama=base.llama,
            qformer_dim=32,
            queries_per_sec=2,
            use_sr_predictor=False,
            max_video_frames=16,
            eos_token_id=2,
            pad_token_id=0,
            conformer_size="S",
            proj_mid_dim=48,
            head_dim=144,
            max_mel_frames=80,
        )


def mel_lengths_from_samples(audio_lengths: jnp.ndarray) -> jnp.ndarray:
    """floor(samples/160) — matches the offline mel extractor
    (src/modelSpeech.py:246-252, generateLogMel-Spectrograms.py)."""
    return jnp.maximum(audio_lengths // HOP, 1).astype(jnp.int32)


class SpeechHead(nn.Module):
    """proj1 -> (ln1) -> resize-to-mel -> proj2 -> (ln2) -> Conformer ->
    (ln3) -> mel head.  ``use_layer_norms`` distinguishes NoLLM from Speech."""

    cfg: SpeechConfig
    use_layer_norms: bool = False
    emit_mel: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, Q, D_in] query-aligned hidden states
        token_lens: jnp.ndarray,  # [B]
        mel_lens: jnp.ndarray,  # [B] target frame counts
        train: bool = False,
    ):
        cfg = self.cfg
        x = nn.Dense(cfg.proj_mid_dim, dtype=self.dtype, name="proj1")(tokens)
        if self.use_layer_norms:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        x = linear_resize_batched(x, token_lens, mel_lens, cfg.max_mel_frames)
        x = nn.Dense(cfg.head_dim, dtype=self.dtype, name="proj2")(x)
        if self.use_layer_norms:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        conf_cfg = ConformerConfig.sized(
            cfg.conformer_size, moe_experts=cfg.conformer_moe_experts
        )
        x = ConformerEncoder(conf_cfg, dtype=self.dtype, name="conformer")(
            x, lengths=mel_lens, deterministic=not train
        )
        if self.use_layer_norms:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln3")(x)
        if self.emit_mel:
            return nn.Dense(MEL_BINS, dtype=self.dtype, name="mel_head")(x)
        return x  # [B, T_mel, head_dim] for the E2E vocoder stack


def extract_query_hiddens(
    hidden: jnp.ndarray,  # [B, L, D] llama last hidden (left-padded layout)
    query_lens: jnp.ndarray,  # [B]
    max_queries: int,
) -> jnp.ndarray:
    """Pull the query-token hidden states out of the left-padded sequence.

    Prompt layout is [pad | instruction | queries] so queries occupy the LAST
    q_i slots; query k of row i sits at slot L - q_i + k (replaces the
    per-sample slicing loop at src/modelSpeech.py:220-238).
    """
    b, l, d = hidden.shape
    k = jnp.arange(max_queries)[None, :]
    idx = l - query_lens[:, None] + k  # [B, Q]
    idx = jnp.clip(idx, 0, l - 1)
    out = jnp.take_along_axis(hidden, idx[..., None], axis=1)
    valid = (k < query_lens[:, None])[..., None]
    return jnp.where(valid, out, jnp.zeros((), out.dtype))


class SpeechLLMModel(nn.Module):
    """MMS_LLaMA_Speech: LLaMA hidden states drive the mel head."""

    cfg: SpeechConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = AVSREncoder(self.cfg, dtype=self.dtype)
        self.llama = LlamaModel(self.cfg.llama, dtype=self.dtype)
        self.head = SpeechHead(self.cfg, use_layer_norms=False, dtype=self.dtype)

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        cfg = self.cfg
        queries, query_lens = self.encoder(
            batch["audio_feats"], batch["video"], batch["video_lengths"], train=train
        )
        pad_emb = self.llama.embed(jnp.asarray(cfg.pad_token_id))
        inst_emb = self.llama.embed(batch["instruction"])
        emb, attn_mask, _ = assemble_left_padded(pad_emb, inst_emb, queries, query_lens)
        out = self.llama(
            inputs_embeds=emb,
            attn_mask=attn_mask,
            deterministic=not train,
            return_hidden=True,
            compute_logits=False,
        )
        av_hidden = extract_query_hiddens(out["hidden"], query_lens, cfg.max_queries)
        mel_lens = mel_lengths_from_samples(batch["audio_lengths"])
        mel = self.head(av_hidden, query_lens, mel_lens, train=train)
        return {"melspec": mel, "mel_lengths": mel_lens}


class SpeechNoLLMModel(nn.Module):
    """MMS_Speech_NoLLM: Q-Former output feeds the head; modality dropout."""

    cfg: SpeechConfig
    emit_mel: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # reference NoLLM stack is qformer -> avfeat_to_llm projector (inside
        # AVSREncoder, output dim = cfg.llama.hidden_size, set to qformer_dim
        # for NoLLM configs) -> proj1 (src/modelSpeechNoLLM.py:140-157,348);
        # no extra projector in between
        self.encoder = AVSREncoder(self.cfg, dtype=self.dtype)
        self.head = SpeechHead(
            self.cfg, use_layer_norms=True, emit_mel=self.emit_mel, dtype=self.dtype
        )

    def __call__(self, batch, train: bool = False):
        cfg = self.cfg
        # batch-level modality dropout mode (0=av, 1=video_only,
        # 2=audio_only) is sampled by the trainer and shipped in the batch
        # (src/modelSpeechNoLLM.py:312-322 samples per batch too); honored
        # whenever present so eval can also force a single-modality ablation
        queries, query_lens = self.encoder(
            batch["audio_feats"],
            batch["video"],
            batch["video_lengths"],
            train=train,
            modality_mode=batch.get("modality_mode"),
        )
        mel_lens = mel_lengths_from_samples(batch["audio_lengths"])
        out = self.head(queries, query_lens, mel_lens, train=train)
        if self.emit_mel:
            return {"melspec": out, "mel_lengths": mel_lens}
        return {"features": out, "mel_lengths": mel_lens}


class SpeechE2EModel(nn.Module):
    """MMS_Speech_NoLLM_E2E: Conformer features -> HiFi-GAN -> waveform."""

    cfg: SpeechConfig
    vocoder: HifiGanConfig = field(default_factory=HifiGanConfig)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.trunk = SpeechNoLLMModel(self.cfg, emit_mel=False, dtype=self.dtype)
        # conv_pre replaced by a 512->512 weight-normed adapter
        # (src/modelSpeechNoLLM_E2E.py:77-91); we reuse the generator module
        # with in_channels = head_dim so its conv_pre IS the adapter.
        voc_cfg = HifiGanConfig(
            in_channels=self.cfg.head_dim,
            resblock_kernel_sizes=self.vocoder.resblock_kernel_sizes,
            resblock_dilations=self.vocoder.resblock_dilations,
            upsample_factors=self.vocoder.upsample_factors,
            upsample_kernel_sizes=self.vocoder.upsample_kernel_sizes,
            upsample_initial_channel=self.vocoder.upsample_initial_channel,
        )
        self.generator = HifiGanGenerator(voc_cfg, dtype=self.dtype)

    def __call__(self, batch, train: bool = False):
        out = self.trunk(batch, train=train)
        # lengths thread per-stage masking through the upsampling stack so
        # the static padded frame buffer cannot leak into the valid tail
        wav = self.generator(out["features"], lengths=out["mel_lengths"])
        return {"waveform": wav, "mel_lengths": out["mel_lengths"]}


# --- registered systems ------------------------------------------------------


@register_model("mms_llama_speech", config=SpeechConfig)
class SpeechLLMSystem:
    def __init__(self, cfg: SpeechConfig):
        self.cfg = cfg
        self.module = SpeechLLMModel(cfg)

    @classmethod
    def from_config(cls, cfg):
        return cls(cfg)


@register_model("mms_speech_nollm", config=SpeechConfig)
class SpeechNoLLMSystem:
    def __init__(self, cfg: SpeechConfig):
        self.cfg = cfg
        self.module = SpeechNoLLMModel(cfg)

    @classmethod
    def from_config(cls, cfg):
        return cls(cfg)


@register_model("mms_speech_nollm_e2e", config=SpeechConfig)
class SpeechE2ESystem:
    def __init__(self, cfg: SpeechConfig, vocoder: Optional[HifiGanConfig] = None):
        self.cfg = cfg
        self.module = SpeechE2EModel(cfg, vocoder or HifiGanConfig())

    @classmethod
    def from_config(cls, cfg):
        return cls(cfg)
