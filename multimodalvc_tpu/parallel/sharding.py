"""Parameter sharding rules: regex path -> PartitionSpec.

Covers the reference's parallelism menu natively (reference checklist:
SURVEY.md §2.5 — fairseq legacy DDP, fairscale FSDP/ZeRO, Megatron TP):
 * data parallel   : batch over ("data","fsdp"); params replicated
 * FSDP / ZeRO-3   : params sharded over "fsdp" on their largest dim
 * tensor parallel : attention/MLP matmuls split over "tensor"
 * expert parallel : expert-stacked weights split over "expert"

Rules are ordered; first regex match wins.  Anything unmatched is sharded by
the generic FSDP fallback (largest divisible dim over "fsdp").
"""
from __future__ import annotations

import logging
import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

# (path regex, partition spec). Paths are "/"-joined pytree key paths.
Rule = Tuple[str, P]

# Tensor-parallel rules for transformer-family weights. Kernel shapes are
# [in, out]: column-parallel projections shard the out dim, row-parallel
# (output) projections shard the in dim, mirroring Megatron's split but via
# GSPMD annotations instead of explicit comm calls.
TRANSFORMER_TP_RULES: List[Rule] = [
    (r".*(q_proj|k_proj|v_proj|query|key|value|wq|wk|wv)/kernel$", P("fsdp", "tensor")),
    (r".*(gate_proj|up_proj|fc1|w1|w3|intermediate)/.*kernel$", P("fsdp", "tensor")),
    (r".*(o_proj|out_proj|wo|fc2|w2|output_proj)/kernel$", P("tensor", "fsdp")),
    (r".*embed_tokens/embedding$", P("tensor", "fsdp")),
    (r".*lm_head/kernel$", P("fsdp", "tensor")),
    (r".*(bias|scale|b)$", P()),
    (r".*experts.*kernel$", P("expert", "fsdp", "tensor")),
    # BaseMoELayer stacked expert FFN banks [E, d, f]/[E, f, d]: shard the
    # expert dim; centroids stay replicated (routing is per-token)
    (r".*experts_w\d$", P("expert")),
    (r".*expert_centroids$", P()),
]


def _fsdp_fallback_spec(shape: Sequence[int], fsdp_size: int) -> P:
    """Shard the largest divisible dim over 'fsdp'; replicate small params."""
    if fsdp_size <= 1 or not shape or max(shape) < 1024:
        return P()
    dims = sorted(range(len(shape)), key=lambda i: -shape[i])
    for d in dims:
        if shape[d] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[d] = "fsdp"
            return P(*spec)
    return P()


def _spec_fits(shape: Sequence[int], spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            continue
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if size > 1 and dim % size != 0:
            return False
    return True


def infer_param_specs(
    params: Any,
    mesh: Mesh,
    rules: Optional[List[Rule]] = None,
) -> Any:
    """Map a param pytree to PartitionSpecs using rules + FSDP fallback."""
    if rules is None:
        rules = TRANSFORMER_TP_RULES
    compiled = [(re.compile(rx), spec) for rx, spec in rules]
    fsdp_size = mesh.shape.get("fsdp", 1)

    def assign(path, leaf):
        path_str = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        shape = getattr(leaf, "shape", ())
        for rx, spec in compiled:
            if rx.match(path_str):
                if _spec_fits(shape, spec, mesh):
                    return spec
                break
        return _fsdp_fallback_spec(shape, fsdp_size)

    return jax.tree_util.tree_map_with_path(assign, params)


def specs_to_shardings(specs: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Any, mesh: Mesh, rules: Optional[List[Rule]] = None) -> Tuple[Any, Any]:
    """Device-put params according to inferred specs; returns (params, specs)."""
    specs = infer_param_specs(params, mesh, rules)
    shardings = specs_to_shardings(specs, mesh)
    params = jax.device_put(params, shardings)
    return params, specs


def constrain(x, mesh: Mesh, *spec) -> Any:
    """with_sharding_constraint convenience (no-op outside a mesh context)."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
