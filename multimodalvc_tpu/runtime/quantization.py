"""Post-training scalar quantization of parameter trees.

Reference analog: fairseq/fairseq/modules/quantization/scalar (int8
emulated quantization) and /pq (iPQ codebooks).  Here the practical TPU
uses are checkpoint/transfer compression and int8 weight storage:
``quantize_tree`` maps float leaves to {int8 codes + per-channel scales},
``dequantize_tree`` restores float arrays (bf16 default — matmuls then run
on the MXU exactly as before).

Measured note (this repo's bench probes): on-the-fly int8 dequant inside
the decode loop gave no wall-clock win on v5e through XLA (the convert is
not fused into the dot), so quantization stays a storage/IO feature;
weight-streaming wins would need a fused dequant-matmul Pallas kernel.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np

_QKEY = "__int8__"


def _quantize_leaf(x: np.ndarray) -> Dict[str, np.ndarray]:
    """Symmetric per-output-channel (last axis) int8 quantization."""
    axis = tuple(range(x.ndim - 1)) if x.ndim > 1 else ()
    amax = np.maximum(np.abs(x).max(axis=axis, keepdims=True), 1e-12)
    scale = (amax / 127.0).astype(np.float32)
    q = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    return {_QKEY: q, "scale": scale.astype(np.float32)}


def _is_quantized(node: Any) -> bool:
    return isinstance(node, dict) and _QKEY in node


def quantize_tree(tree: Any, min_size: int = 4096) -> Any:
    """int8-quantize float leaves with >= min_size elements (small leaves —
    norms, biases — stay exact)."""

    def q(leaf):
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind == "f" and arr.size >= min_size:
            return _quantize_leaf(arr.astype(np.float32))
        return arr

    return jax.tree.map(q, tree)


def dequantize_tree(tree: Any, dtype=np.float32) -> Any:
    def walk(node):
        if _is_quantized(node):
            return (node[_QKEY].astype(np.float32) * node["scale"]).astype(dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [walk(v) for v in node]
            return type(node)(vals) if isinstance(node, list) else tuple(vals)
        return node

    return walk(tree)


def quantization_error(tree: Any) -> Tuple[float, float]:
    """(max relative error, compression ratio) of quantize->dequantize."""
    flat = jax.tree.leaves(tree)
    q = quantize_tree(tree)
    deq = dequantize_tree(q)
    flat_d = jax.tree.leaves(deq)
    max_rel, orig_bytes, q_bytes = 0.0, 0, 0
    for a, b in zip(flat, flat_d):
        a = np.asarray(a)
        orig_bytes += a.nbytes
        if a.dtype.kind == "f" and a.size:
            denom = max(float(np.abs(a).max()), 1e-12)
            max_rel = max(max_rel, float(np.abs(a - b).max()) / denom)
    for leaf in jax.tree.leaves(q):
        q_bytes += np.asarray(leaf).nbytes
    return max_rel, orig_bytes / max(q_bytes, 1)
