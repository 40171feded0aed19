"""Device-mesh construction for the (data, fsdp, tensor, sequence, expert,
pipeline) parallelism axes.

TPU-native replacement for the reference's process-group plumbing
(reference: fairseq/fairseq/distributed/utils.py:242-491 — NCCL init, DP vs
MP group split).  Here a single `jax.sharding.Mesh` carries every axis and
XLA inserts the collectives; ICI handles intra-slice traffic, DCN the `data`
axis across slices.
"""
from __future__ import annotations

import logging
import math
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

_CURRENT_MESH: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def get_current_mesh() -> Optional[Mesh]:
    """The mesh created by the last make_mesh call (for modules that want
    collective ops — e.g. sequence-parallel ring attention — without
    threading the mesh through every config)."""
    return _CURRENT_MESH

# Canonical axis order: data-like axes first (outermost, cross-slice
# friendly), then model axes that want high-bandwidth ICI neighbours.
AXIS_ORDER = ("pipeline", "data", "fsdp", "sequence", "expert", "tensor")

# Axes over which a data batch is sharded (batch dim = data * fsdp).
BATCH_AXES = ("data", "fsdp")


def resolve_axis_sizes(
    requested: Dict[str, int], n_devices: Optional[int] = None
) -> Dict[str, int]:
    """Resolve -1 ("fill") entries so the product equals the device count."""
    if n_devices is None:
        n_devices = jax.device_count()
    sizes = {ax: int(requested.get(ax, 1)) for ax in AXIS_ORDER}
    fill = [ax for ax, s in sizes.items() if s == -1]
    if len(fill) > 1:
        raise ValueError(f"at most one mesh axis may be -1, got {fill}")
    fixed = math.prod(s for s in sizes.values() if s != -1)
    if fill:
        if n_devices % fixed != 0:
            raise ValueError(
                f"cannot fill axis {fill[0]}: {n_devices} devices not divisible by {fixed}"
            )
        sizes[fill[0]] = n_devices // fixed
    if math.prod(sizes.values()) != n_devices:
        raise ValueError(
            f"mesh axes {sizes} product {math.prod(sizes.values())} != device count {n_devices}"
        )
    return sizes


def make_mesh(
    axis_sizes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create the global mesh. ``axis_sizes`` maps axis name -> size (-1 fills).

    Multi-host / multi-slice: when the devices span multiple slices (or host
    processes), the layout comes from ``create_hybrid_device_mesh`` so the
    slice boundary is crossed only by data-like axes (data, then pipeline) —
    model-axis collectives (tensor/fsdp/expert/sequence) stay on intra-slice
    ICI (reference's DDP-outside/MP-inside group split, distributed/utils.py
    :376-491, recast as device layout instead of process groups)."""
    if devices is None:
        devices = jax.devices()
    sizes = resolve_axis_sizes(axis_sizes or {}, len(devices))
    shape = tuple(sizes[ax] for ax in AXIS_ORDER)
    from .distributed import hybrid_device_array, num_granules

    if num_granules(devices) > 1:
        dev_array = hybrid_device_array(sizes, AXIS_ORDER, list(devices))
    else:
        dev_array = np.asarray(devices).reshape(shape)
    mesh = Mesh(dev_array, AXIS_ORDER)
    logger.info("mesh: %s", {ax: s for ax, s in zip(AXIS_ORDER, shape) if s > 1} or "single-device")
    set_current_mesh(mesh)
    return mesh


def single_device_mesh() -> Mesh:
    return make_mesh({ax: 1 for ax in AXIS_ORDER[:-1]})


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a [batch, ...] array: batch split over (data, fsdp)."""
    return NamedSharding(mesh, P(BATCH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec() -> P:
    return P(BATCH_AXES)


def local_batch_multiple(mesh: Mesh) -> int:
    """The PER-PROCESS batch must be a multiple of this.

    Single-process: data * fsdp (the global batch divisibility).  Multi-host:
    each process contributes 1/process_count of the global batch
    (shard_batches slices the batch list; global_batch_from_local joins the
    local shards), so the local requirement shrinks accordingly."""
    g = int(np.prod([mesh.shape[a] for a in BATCH_AXES]))
    p = jax.process_count()
    if g % p == 0 and p > 1:
        return max(1, g // p)
    return g
