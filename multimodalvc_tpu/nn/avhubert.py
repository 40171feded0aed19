"""AV-HuBERT encoder (fine-tuning path) — the frozen lip-reading backbone.

TPU re-design of the reference's AVHubertModel.extract_finetune flow
(reference: avhubert/hubert.py:334-744):
  audio stream: linear proj of stacked filterbanks [B,T,104] -> D
  video stream: ResNet front end [B,T,H,W,1] -> 512 -> linear proj -> D
  a missing modality contributes zeros (hubert.py:704-708 — the MMS-LLaMA
  path always runs video-only, src/model.py:285)
  concat fusion -> LayerNorm(2D) -> post_extract_proj(2D->D) -> 24-layer
  wav2vec2-style transformer (conv positional embedding, pre-LN for the
  'large' recipe).

Everything static-shape: frame-length padding rides a lengths vector into
masked attention instead of boolean padding tensors.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import TransformerEncoder
from .resnet import ResEncoder


@dataclass
class AVHubertConfig:
    encoder_embed_dim: int = 1024  # large
    encoder_layers: int = 24
    encoder_attention_heads: int = 16
    encoder_ffn_dim: int = 4096
    audio_feat_dim: int = 104  # 26-dim fbank x 4-frame stack
    modality_fuse: str = "concat"
    layer_norm_first: bool = True  # large recipe
    sub_encoder_layers: int = 0
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dropout: float = 0.0
    resnet_relu_type: str = "prelu"
    remat: bool = False  # checkpoint layer activations
    sequence_parallel: bool = False  # ring attention over the sequence axis

    @classmethod
    def large(cls):
        return cls()

    @classmethod
    def tiny(cls):  # for tests
        return cls(
            encoder_embed_dim=64,
            encoder_layers=2,
            encoder_attention_heads=4,
            encoder_ffn_dim=128,
        )


class AVHubertModel(nn.Module):
    cfg: AVHubertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        audio: Optional[jnp.ndarray] = None,  # [B, T, audio_feat_dim]
        video: Optional[jnp.ndarray] = None,  # [B, T, H, W, 1]
        *,
        lengths: Optional[jnp.ndarray] = None,  # [B] valid frames
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        d = cfg.encoder_embed_dim
        if audio is None and video is None:
            raise ValueError("at least one modality required")

        feats = []
        if video is not None:
            v = ResEncoder(relu_type=cfg.resnet_relu_type, dtype=self.dtype, name="video_resnet")(
                video, train=train
            )
            v = nn.Dense(d, dtype=self.dtype, name="video_proj")(v)
        if audio is not None:
            a = nn.Dense(d, dtype=self.dtype, name="audio_proj")(audio)

        if video is not None and audio is None:
            a = jnp.zeros_like(v)
        elif audio is not None and video is None:
            v = jnp.zeros_like(a)

        if cfg.modality_fuse == "concat":
            # reference concatenates audio first (hubert.py:713-714)
            x = jnp.concatenate([a, v], axis=-1)
        elif cfg.modality_fuse == "add":
            x = a + v
        else:
            raise ValueError(cfg.modality_fuse)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        if x.shape[-1] != d:
            x = nn.Dense(d, dtype=self.dtype, name="post_extract_proj")(x)
        x = TransformerEncoder(
            num_layers=cfg.encoder_layers,
            num_heads=cfg.encoder_attention_heads,
            ffn_dim=cfg.encoder_ffn_dim,
            dropout=cfg.dropout,
            layer_norm_first=cfg.layer_norm_first,
            conv_pos=cfg.conv_pos,
            conv_pos_groups=cfg.conv_pos_groups,
            remat=cfg.remat,
            sequence_parallel=cfg.sequence_parallel,
            dtype=self.dtype,
            name="encoder",
        )(x, lengths=lengths, deterministic=not train)
        return x


# ---------------------------------------------------------------------------
# Torch checkpoint import (fairseq AV-HuBERT state dict -> our param tree)
# ---------------------------------------------------------------------------


def _linear(state, src):
    return {
        "kernel": jnp.asarray(np.asarray(state[f"{src}.weight"]).T),
        "bias": jnp.asarray(state[f"{src}.bias"]),
    }


def _ln(state, src):
    return {
        "scale": jnp.asarray(state[f"{src}.weight"]),
        "bias": jnp.asarray(state[f"{src}.bias"]),
    }


def _bn(state, src):
    params = {"scale": jnp.asarray(state[f"{src}.weight"]), "bias": jnp.asarray(state[f"{src}.bias"])}
    stats = {
        "mean": jnp.asarray(state[f"{src}.running_mean"]),
        "var": jnp.asarray(state[f"{src}.running_var"]),
    }
    return params, stats


def map_resnet(state: Dict[str, np.ndarray], prefix: str):
    """Map a reference ResEncoder state dict (avhubert/resnet.py:131-169;
    keys frontend3D.* + trunk.layer{1..4}.{0,1}.*) onto our nn/resnet
    ResEncoder (params, batch_stats) subtrees.  ``prefix`` locates the
    ResEncoder inside a larger checkpoint (e.g.
    'feature_extractor_video.resnet.' inside an AV-HuBERT state dict)."""
    res_p: Dict[str, dict] = {}
    res_s: Dict[str, dict] = {}
    pre = prefix.rstrip(".")
    # torch conv3d [O, I=1, kT, kH, kW] -> our tap-stacked conv2d kernel
    # [kH, kW, kT, O] (nn/resnet.py runs the stride-1 time window as input
    # channels; tap k carries the kT=k slice)
    res_p["frontend_conv"] = {
        "kernel": jnp.asarray(
            np.asarray(state[f"{pre}.frontend3D.0.weight"])
            .transpose(3, 4, 2, 1, 0)
            .reshape(7, 7, 5, -1)
        )
    }
    p, s = _bn(state, f"{pre}.frontend3D.1")
    res_p["frontend_bn"], res_s["frontend_bn"] = p, s
    res_p["frontend_relu"] = {"alpha": jnp.asarray(state[f"{pre}.frontend3D.2.weight"])}

    trunk_p: Dict[str, dict] = {}
    trunk_s: Dict[str, dict] = {}
    for li in range(1, 5):
        for b in range(2):
            src = f"{pre}.trunk.layer{li}.{b}"
            blk_p: Dict[str, dict] = {}
            blk_s: Dict[str, dict] = {}
            for cn in ("conv1", "conv2"):
                blk_p[cn] = {
                    "kernel": jnp.asarray(np.asarray(state[f"{src}.{cn}.weight"]).transpose(2, 3, 1, 0))
                }
            for bn_name in ("bn1", "bn2"):
                p, s = _bn(state, f"{src}.{bn_name}")
                blk_p[bn_name], blk_s[bn_name] = p, s
            for rl in ("relu1", "relu2"):
                blk_p[rl] = {"alpha": jnp.asarray(state[f"{src}.{rl}.weight"])}
            if f"{src}.downsample.0.weight" in state:
                blk_p["downsample_conv"] = {
                    "kernel": jnp.asarray(
                        np.asarray(state[f"{src}.downsample.0.weight"]).transpose(2, 3, 1, 0)
                    )
                }
                p, s = _bn(state, f"{src}.downsample.1")
                blk_p["downsample_bn"], blk_s["downsample_bn"] = p, s
            trunk_p[f"layer{li}_{b}"] = blk_p
            trunk_s[f"layer{li}_{b}"] = blk_s
    res_p["trunk"] = trunk_p
    res_s["trunk"] = trunk_s
    return res_p, res_s


def import_torch_avhubert(state: Dict[str, np.ndarray], cfg: AVHubertConfig):
    """Map a fairseq AV-HuBERT 'model' state dict (avhubert/hubert.py keys,
    loaded at src/model.py:191-224) onto AVHubertModel variables."""
    params: Dict[str, dict] = {}
    batch_stats: Dict[str, dict] = {}

    res_p, res_s = map_resnet(state, "feature_extractor_video.resnet.")
    params["video_resnet"] = res_p
    batch_stats["video_resnet"] = res_s

    params["video_proj"] = _linear(state, "feature_extractor_video.proj")
    params["audio_proj"] = _linear(state, "feature_extractor_audio.proj")
    params["layer_norm"] = _ln(state, "layer_norm")
    if "post_extract_proj.weight" in state:
        params["post_extract_proj"] = _linear(state, "post_extract_proj")

    # --- transformer -------------------------------------------------------
    enc: Dict[str, dict] = {}
    # torch weight-normed pos_conv: fold g*v/||v|| into a plain kernel
    if "encoder.pos_conv.0.weight_v" in state:
        v = np.asarray(state["encoder.pos_conv.0.weight_v"])  # [D, D/g, K]
        g = np.asarray(state["encoder.pos_conv.0.weight_g"])
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))  # torch dim=2
        w = g * v / np.maximum(norm, 1e-12)
    else:
        w = np.asarray(state["encoder.pos_conv.0.weight"])
    enc["pos_conv"] = {
        "conv": {
            "kernel": jnp.asarray(w.transpose(2, 1, 0)),
            "bias": jnp.asarray(state["encoder.pos_conv.0.bias"]),
        }
    }
    enc["layer_norm"] = _ln(state, "encoder.layer_norm")
    n_layers = cfg.encoder_layers
    for i in range(n_layers):
        src = f"encoder.layers.{i}"
        enc[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _linear(state, f"{src}.self_attn.q_proj"),
                "k_proj": _linear(state, f"{src}.self_attn.k_proj"),
                "v_proj": _linear(state, f"{src}.self_attn.v_proj"),
                "out_proj": _linear(state, f"{src}.self_attn.out_proj"),
            },
            "self_attn_layer_norm": _ln(state, f"{src}.self_attn_layer_norm"),
            "ffn": {
                "fc1": _linear(state, f"{src}.fc1"),
                "fc2": _linear(state, f"{src}.fc2"),
            },
            "final_layer_norm": _ln(state, f"{src}.final_layer_norm"),
        }
    params["encoder"] = enc
    return {"params": params, "batch_stats": batch_stats}
