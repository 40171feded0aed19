"""AV-HuBERT masked-prediction pretraining.

Reference: avhubert/hubert.py forward (:536-693) + AVHubertPretrainingTask
(avhubert/hubert_pretraining.py): span-mask fused features, run the
transformer, predict frame-level cluster labels with cosine-similarity
logits against label embeddings at a temperature, cross-entropy on masked
(and optionally unmasked) frames.

This provides the pretraining capability the product models build on (the
fine-tune path lives in nn/avhubert.py).  Masking is the static-shape
variant from ops/masking.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config.registry import register_model
from ..nn.avhubert import AVHubertConfig
from ..nn.layers import TransformerEncoder
from ..nn.resnet import ResEncoder
from ..ops.masking import apply_feature_mask, compute_span_mask


@dataclass
class AVHubertPretrainConfig:
    encoder: AVHubertConfig = field(default_factory=AVHubertConfig)
    num_classes: int = 2004  # k-means clusters + specials (large_vox recipe)
    final_dim: int = 256
    logit_temp: float = 0.1
    mask_prob: float = 0.8
    mask_length: int = 10
    masking_type: str = "feature"  # input | feature

    @classmethod
    def tiny(cls):
        return cls(
            encoder=AVHubertConfig.tiny(),
            num_classes=16,
            final_dim=16,
            mask_length=3,
        )


class AVHubertPretrainModel(nn.Module):
    cfg: AVHubertPretrainConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        audio: Optional[jnp.ndarray],  # [B, T, F]
        video: Optional[jnp.ndarray],  # [B, T, H, W, 1]
        targets: jnp.ndarray,  # [B, T] int cluster labels
        lengths: jnp.ndarray,  # [B]
        train: bool = True,
        output_layer: Optional[int] = None,  # feature-dump mode (see below)
    ) -> Dict[str, jnp.ndarray]:
        """``output_layer`` switches to feature-extraction mode for the
        iteration-2+ clustering pipeline (reference:
        avhubert/clustering/dump_hubert_feature.py
        HubertFeatureReader.get_feats — extract_features with mask=False):
        no span masking is applied and the return value is the [B, T, D]
        hidden state after that encoder layer (0 = the fused frontend
        features, the reference's ret_conv=True)."""
        cfg = self.cfg
        ec = cfg.encoder
        d = ec.encoder_embed_dim

        feats = []
        if video is not None:
            v = ResEncoder(relu_type=ec.resnet_relu_type, dtype=self.dtype, name="video_resnet")(
                video, train=train
            )
            v = nn.Dense(d, dtype=self.dtype, name="video_proj")(v)
        if audio is not None:
            a = nn.Dense(d, dtype=self.dtype, name="audio_proj")(audio)
        if video is not None and audio is None:
            a = jnp.zeros_like(v)
        elif audio is not None and video is None:
            v = jnp.zeros_like(a)

        x = jnp.concatenate([a, v], axis=-1) if ec.modality_fuse == "concat" else a + v
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        if x.shape[-1] != d:
            x = nn.Dense(d, dtype=self.dtype, name="post_extract_proj")(x)

        if output_layer == 0:
            return x  # frontend features (ret_conv=True analog)

        # --- span masking on fused features (masking_type='feature') --------
        b, t = x.shape[:2]
        mask_emb = self.param("mask_emb", nn.initializers.uniform(1.0), (d,))
        if train and output_layer is None:
            rng = self.make_rng("mask")
            mask = compute_span_mask(
                rng, b, t, lengths, cfg.mask_prob, cfg.mask_length
            )
        else:
            mask = jnp.zeros((b, t), bool)
        x = apply_feature_mask(x, mask, mask_emb)

        x = TransformerEncoder(
            num_layers=ec.encoder_layers,
            num_heads=ec.encoder_attention_heads,
            ffn_dim=ec.encoder_ffn_dim,
            layer_norm_first=ec.layer_norm_first,
            dtype=self.dtype,
            name="encoder",
        )(x, lengths=lengths, deterministic=not train, output_layer=output_layer)
        if output_layer is not None:
            return x

        # --- cosine-similarity logits over label embeddings ------------------
        proj = nn.Dense(cfg.final_dim, dtype=self.dtype, name="final_proj")(x)
        label_embs = self.param(
            "label_embs_concat",
            nn.initializers.uniform(1.0),
            (cfg.num_classes, cfg.final_dim),
        )
        pn = proj / jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-8)
        ln_ = label_embs / jnp.maximum(
            jnp.linalg.norm(label_embs, axis=-1, keepdims=True), 1e-8
        )
        logits = (
            jnp.einsum("btd,cd->btc", pn, ln_.astype(pn.dtype)) / cfg.logit_temp
        )

        valid = jnp.arange(t)[None, :] < lengths[:, None]
        masked = mask & valid
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        token_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]

        def masked_mean(sel):
            n = jnp.maximum(jnp.sum(sel), 1)
            return -jnp.sum(jnp.where(sel, token_logp, 0.0)) / n, n

        loss_m, n_m = masked_mean(masked)
        loss_u, n_u = masked_mean((~mask) & valid)
        preds = jnp.argmax(logits, axis=-1)
        acc_m = jnp.sum(jnp.where(masked, preds == targets, False)) / jnp.maximum(
            jnp.sum(masked), 1
        )
        return {
            "loss_masked": loss_m,
            "loss_unmasked": loss_u,
            "n_masked": n_m,
            "acc_masked": acc_m,
            "mask": mask,
        }


@register_model("av_hubert_pretrain", config=AVHubertPretrainConfig)
class AVHubertPretrainSystem:
    def __init__(self, cfg: AVHubertPretrainConfig):
        self.cfg = cfg
        self.module = AVHubertPretrainModel(cfg)

    @classmethod
    def from_config(cls, cfg):
        return cls(cfg)
