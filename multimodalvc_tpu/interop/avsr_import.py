"""Import reference MMS-LLaMA product checkpoints into the AVSR param tree.

Reference checkpoints store ONLY trainable weights (frozen params stripped,
src/model.py:268-271): the Q-Former (vendored BERT naming), query_tokens,
afeat_1d_conv, avfeat_to_llm projector, and peft LoRA adapters.  Frozen
encoders re-load from their own artifacts: AV-HuBERT (import_torch_avhubert),
HF Whisper (import_hf_whisper_encoder), HF LLaMA (import_hf_llama), the SR
predictor (import_sr_predictor below) — mirroring how the reference
re-sources them at load (src/model.py:183-256).
"""
from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _lin(state, src):
    return {
        "kernel": jnp.asarray(np.asarray(state[f"{src}.weight"]).T),
        "bias": jnp.asarray(state[f"{src}.bias"]),
    }


def _ln(state, src):
    return {
        "scale": jnp.asarray(state[f"{src}.weight"]),
        "bias": jnp.asarray(state[f"{src}.bias"]),
    }


def import_reference_avsr(
    state: Dict[str, np.ndarray], num_qformer_layers: int = 2
) -> Dict[str, Any]:
    """Map a reference trainable-state dict onto our param-subtree updates.

    Returns {'encoder': {...}, 'llama': {...}} subtrees to be merged over an
    initialised AVSR param tree.
    """
    state = {k.removeprefix("module."): v for k, v in state.items()}
    enc: Dict[str, Any] = {}

    # 50->25 Hz conv (src/model.py:115): torch [O, I, K] -> flax [K, I, O]
    if "afeat_1d_conv.weight" in state:
        enc["afeat_1d_conv"] = {
            "kernel": jnp.asarray(np.asarray(state["afeat_1d_conv.weight"]).transpose(2, 1, 0)),
            "bias": jnp.asarray(state["afeat_1d_conv.bias"]),
        }

    # Q-Former (vendored BLIP-2 BERT naming, src/sub_model/Qformer.py)
    qf: Dict[str, Any] = {}
    if "query_tokens" in state:
        qf["query_tokens"] = jnp.asarray(state["query_tokens"])
    if "Qformer.bert.embeddings.LayerNorm.weight" in state:
        qf["embeddings_ln"] = _ln(state, "Qformer.bert.embeddings.LayerNorm")
    for i in range(num_qformer_layers):
        src = f"Qformer.bert.encoder.layer.{i}"
        if f"{src}.attention.self.query.weight" not in state:
            continue
        qf[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(state, f"{src}.attention.self.query"),
                "k_proj": _lin(state, f"{src}.attention.self.key"),
                "v_proj": _lin(state, f"{src}.attention.self.value"),
                "out_proj": _lin(state, f"{src}.attention.output.dense"),
            },
            "self_ln": _ln(state, f"{src}.attention.output.LayerNorm"),
            "cross_attn": {
                "q_proj": _lin(state, f"{src}.crossattention.self.query"),
                "k_proj": _lin(state, f"{src}.crossattention.self.key"),
                "v_proj": _lin(state, f"{src}.crossattention.self.value"),
                "out_proj": _lin(state, f"{src}.crossattention.output.dense"),
            },
            "cross_ln": _ln(state, f"{src}.crossattention.output.LayerNorm"),
            "intermediate_query": _lin(state, f"{src}.intermediate_query.dense"),
            "output_query": _lin(state, f"{src}.output_query.dense"),
            "ffn_ln": _ln(state, f"{src}.output_query.LayerNorm"),
        }
    if qf:
        enc["qformer"] = qf

    # projector to LLaMA space (src/sub_model/modules.py:59-72)
    if "avfeat_to_llm.layers.0.weight" in state:
        enc["avfeat_to_llm"] = {
            "layers_0": _lin(state, "avfeat_to_llm.layers.0"),
            "layers_1": _lin(state, "avfeat_to_llm.layers.1"),
        }

    # peft LoRA adapters: ...self_attn.{q,k,v,o}_proj.lora_A(.default).weight
    llama: Dict[str, Any] = {}
    lora_rx = re.compile(
        r"(?:.*\.)?layers\.(\d+)\.self_attn\.([qkvo]_proj)\.lora_([AB])(?:\.default)?\.weight$"
    )
    for key, val in state.items():
        m = lora_rx.match(key)
        if not m:
            continue
        layer, proj, ab = int(m.group(1)), m.group(2), m.group(3)
        dst = llama.setdefault(f"layers_{layer}", {}).setdefault("self_attn", {}).setdefault(
            proj, {}
        )
        arr = np.asarray(val)
        if ab == "A":  # torch [r, in] -> ours [in, r]
            dst["lora_a"] = jnp.asarray(arr.T)
        else:  # torch [out, r] -> ours [r, out]
            dst["lora_b"] = jnp.asarray(arr.T)

    out: Dict[str, Any] = {}
    if enc:
        out["encoder"] = enc
    if llama:
        out["llama"] = llama
    return out


def import_sr_predictor(state: Dict[str, np.ndarray], num_layers: int = 2) -> Dict[str, Any]:
    """Map the sr_predictor checkpoint (src/sub_model/modules.py:108-142,
    loaded at src/model.py:140-144 after stripping the 'sr_predictor.'
    prefix) onto nn/modules.SpeechRatePredictor params."""
    state = {k.removeprefix("sr_predictor."): v for k, v in state.items()}
    p: Dict[str, Any] = {
        "sr_token": jnp.asarray(state["sr_token"]),
        "linear": _lin(state, "linear"),
        "sr_predictor": _lin(state, "sr_predictor"),
    }
    enc: Dict[str, Any] = {}
    # weight-normed pos conv folded (fairseq wav2vec2, dim=2)
    if "encoder.pos_conv.0.weight_v" in state:
        v = np.asarray(state["encoder.pos_conv.0.weight_v"])
        g = np.asarray(state["encoder.pos_conv.0.weight_g"])
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
        enc["pos_conv"] = {
            "conv": {
                "kernel": jnp.asarray(w.transpose(2, 1, 0)),
                "bias": jnp.asarray(state["encoder.pos_conv.0.bias"]),
            }
        }
    enc["layer_norm"] = _ln(state, "encoder.layer_norm")
    for i in range(num_layers):
        src = f"encoder.layers.{i}"
        enc[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _lin(state, f"{src}.self_attn.q_proj"),
                "k_proj": _lin(state, f"{src}.self_attn.k_proj"),
                "v_proj": _lin(state, f"{src}.self_attn.v_proj"),
                "out_proj": _lin(state, f"{src}.self_attn.out_proj"),
            },
            "self_attn_layer_norm": _ln(state, f"{src}.self_attn_layer_norm"),
            "ffn": {
                "fc1": _lin(state, f"{src}.fc1"),
                "fc2": _lin(state, f"{src}.fc2"),
            },
            "final_layer_norm": _ln(state, f"{src}.final_layer_norm"),
        }
    p["encoder"] = enc
    return p


def merge_subtree(params: Dict[str, Any], updates: Dict[str, Any], path: str = "") -> int:
    """Recursively write updates into params (shapes must match).
    Returns the number of leaves written."""
    n = 0
    for k, v in updates.items():
        where = f"{path}/{k}"
        if isinstance(v, dict):
            node = params.setdefault(k, {})
            if not isinstance(node, dict):
                raise TypeError(f"{where}: tree/leaf mismatch")
            n += merge_subtree(node, v, where)
        else:
            if k in params and hasattr(params[k], "shape") and params[k].shape != v.shape:
                raise ValueError(f"{where}: shape {params[k].shape} != {v.shape}")
            params[k] = v
            n += 1
    return n
