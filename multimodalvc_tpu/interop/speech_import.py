"""Import reference speech-head weights (torch) into our param trees.

Covers the ESPnet-lineage Conformer used by all three speech models
(reference: src/divise_conformer/encoder.py Encoder — attribute names
encoders.{i}.{self_attn.linear_*, feed_forward[_macaron].w_*,
conv_module.{pointwise_cov1, depthwise_conv, norm, pointwise_cov2}},
norm_{ff,mha,ff_macaron,conv,final}, after_norm; note the vendored module's
'pointwise_cov' spelling) and the speech-model trainable heads
(src/modelSpeech.py / modelSpeechNoLLM.py: proj1/proj2/mel head/layer norms).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


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


def _bn(state, src):
    params = {
        "scale": jnp.asarray(state[f"{src}.weight"]),
        "bias": jnp.asarray(state[f"{src}.bias"]),
    }
    stats = {
        "mean": jnp.asarray(state[f"{src}.running_mean"]),
        "var": jnp.asarray(state[f"{src}.running_var"]),
    }
    return params, stats


def _pointwise_conv_as_dense(state, src):
    """torch Conv1d kernel_size=1 [O, I, 1] -> flax Dense kernel [I, O]."""
    w = np.asarray(state[f"{src}.weight"])[:, :, 0]
    return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(state[f"{src}.bias"])}


def import_torch_conformer(
    state: Dict[str, np.ndarray], num_blocks: int, prefix: str = "encoder."
) -> Dict[str, Any]:
    """Map a vendored-Conformer state dict onto our ConformerEncoder
    variables ({'params': ..., 'batch_stats': ...} subtrees).

    ``prefix`` locates the ESPnet Encoder inside the checkpoint (e.g.
    'conformer.encoder.' inside a reference speech-model state dict whose
    ConformerEncoder wrapper holds `self.encoder = Encoder(...)`).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(num_blocks):
        src = f"{prefix}encoders.{i}"
        blk: Dict[str, Any] = {
            "self_attn": {
                "q_proj": _lin(state, f"{src}.self_attn.linear_q"),
                "k_proj": _lin(state, f"{src}.self_attn.linear_k"),
                "v_proj": _lin(state, f"{src}.self_attn.linear_v"),
                "out_proj": _lin(state, f"{src}.self_attn.linear_out"),
            },
            "ff": {
                "w_1": _lin(state, f"{src}.feed_forward.w_1"),
                "w_2": _lin(state, f"{src}.feed_forward.w_2"),
            },
            "norm_mha": _ln(state, f"{src}.norm_mha"),
            "norm_ff": _ln(state, f"{src}.norm_ff"),
        }
        if f"{src}.feed_forward_macaron.w_1.weight" in state:
            blk["ff_macaron"] = {
                "w_1": _lin(state, f"{src}.feed_forward_macaron.w_1"),
                "w_2": _lin(state, f"{src}.feed_forward_macaron.w_2"),
            }
            blk["norm_ff_macaron"] = _ln(state, f"{src}.norm_ff_macaron")
        if f"{src}.conv_module.depthwise_conv.weight" in state:
            dw = np.asarray(state[f"{src}.conv_module.depthwise_conv.weight"])
            blk["conv_module"] = {
                "pointwise_conv1": _pointwise_conv_as_dense(
                    state, f"{src}.conv_module.pointwise_cov1"
                ),
                # torch depthwise [D, 1, K] -> flax grouped conv [K, 1, D]
                "depthwise_conv": {
                    "kernel": jnp.asarray(dw.transpose(2, 1, 0)),
                    "bias": jnp.asarray(state[f"{src}.conv_module.depthwise_conv.bias"]),
                },
                "pointwise_conv2": _pointwise_conv_as_dense(
                    state, f"{src}.conv_module.pointwise_cov2"
                ),
            }
            bn_p, bn_s = _bn(state, f"{src}.conv_module.norm")
            blk["conv_module"]["norm"] = bn_p
            stats[f"blocks_{i}"] = {"conv_module": {"norm": bn_s}}
            blk["norm_conv"] = _ln(state, f"{src}.norm_conv")
            blk["norm_final"] = _ln(state, f"{src}.norm_final")
        params[f"blocks_{i}"] = blk
    if f"{prefix}after_norm.weight" in state:
        params["after_norm"] = _ln(state, f"{prefix}after_norm")
    return {"params": params, "batch_stats": stats}


def import_reference_speech(
    state: Dict[str, np.ndarray],
    num_qformer_layers: int = 2,
    conformer_blocks: int = 12,
    generator_cfg=None,
) -> Dict[str, Any]:
    """Map a reference SPEECH-model trainable checkpoint onto param updates.

    Reference speech checkpoints (like the AVSR ones) store only trainables
    (state_dict strips frozen params, src/model.py:268-271): the shared AVSR
    trainables (Q-Former, query_tokens, afeat conv, avfeat_to_llm projector,
    LoRA) plus the speech head — proj1/proj2 (src/modelSpeech.py:29-48),
    ln1/ln2/ln3 + audio/video mask embeddings for NoLLM
    (src/modelSpeechNoLLM.py:155-171), the 12-block Conformer-L, the mel
    head, and (E2E) the weight-normed vocoder_* generator components
    (src/modelSpeechNoLLM_E2E.py:77-96).

    Returns {'encoder': ..., 'llama': ..., 'head': ..., 'head_stats': ...,
    'generator': ...} subtrees; callers nest them into the concrete model
    layout (SpeechLLMModel: encoder/llama/head at the root; NoLLM:
    encoder/head; E2E: trunk/{encoder,head} + generator).  'head_stats' are
    Conformer BatchNorm running stats for the batch_stats collection.
    """
    state = {k.removeprefix("module."): v for k, v in state.items()}
    from .avsr_import import import_reference_avsr

    out: Dict[str, Any] = import_reference_avsr(state, num_qformer_layers)
    enc = out.setdefault("encoder", {})
    for emb in ("audio_mask_emb", "video_mask_emb"):
        if emb in state:
            enc[emb] = jnp.asarray(state[emb])

    head: Dict[str, Any] = {}
    if "proj1.weight" in state:
        head["proj1"] = _lin(state, "proj1")
        head["proj2"] = _lin(state, "proj2")
    if "mel_head.weight" in state:
        head["mel_head"] = _lin(state, "mel_head")
    for i in (1, 2, 3):
        if f"ln{i}.weight" in state:
            head[f"ln{i}"] = _ln(state, f"ln{i}")
    if "conformer.encoder.encoders.0.self_attn.linear_q.weight" in state:
        conf = import_torch_conformer(state, conformer_blocks, prefix="conformer.encoder.")
        head["conformer"] = conf["params"]
        out["head_stats"] = {"conformer": conf["batch_stats"]}
    if head:
        out["head"] = head

    gen_state = {
        k[len("vocoder_") :]: v for k, v in state.items() if k.startswith("vocoder_")
    }
    if "conv_pre.weight_v" in gen_state:
        from ..nn.hifigan import import_torch_generator

        out["generator"] = import_torch_generator(gen_state, generator_cfg)["params"]
    return out
