"""Multi-host / multi-slice runtime bootstrap.

TPU-native analog of the reference's process-group rendezvous
(fairseq/fairseq/distributed/utils.py:47-148 ``infer_init_method`` reads
env:// / SLURM / single-node settings; :242-276 ``distributed_init`` creates
the NCCL/gloo group; :279-285 was its torch_xla TPU branch).  Here the whole
job becomes ONE ``jax.distributed`` cluster: every process calls
``jax.distributed.initialize`` against a coordinator, after which
``jax.devices()`` spans all hosts and GSPMD/XLA inserts the cross-host
collectives — there are no per-rank process groups to manage.

Rendezvous sources, in priority order (mirroring the reference's):
  1. Already initialized (``jax.process_count() > 1``) — no-op.
  2. Explicit JAX-style env: ``COORDINATOR_ADDRESS`` (+ ``NUM_PROCESSES``,
     ``PROCESS_ID``).
  3. torch.distributed.launch-style env: ``MASTER_ADDR`` + ``MASTER_PORT`` +
     ``WORLD_SIZE`` + ``RANK`` (the reference's env:// path).
  4. Managed clusters JAX auto-detects (Cloud TPU pod metadata, SLURM via
     ``SLURM_JOB_ID``, GKE): call ``jax.distributed.initialize()`` with no
     args and let the built-in cluster detection resolve everything.

Data flow under multi-process: each process loads its own shard of batches
(``data.batching.shard_batches`` keyed by process_index) and assembles
global arrays with ``jax.make_array_from_process_local_data``; jitted steps
then run unchanged over the global mesh.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

_INITIALIZED = False


def infer_init_args() -> Optional[Dict]:
    """Decide whether/how to rendezvous, from the environment.

    Returns kwargs for ``jax.distributed.initialize`` ({} means "no-arg
    auto-detect"), or None when nothing signals a multi-process launch
    (single-process: skip initialization entirely — starting the
    coordinator service costs startup time and a port).
    """
    env = os.environ
    if env.get("COORDINATOR_ADDRESS"):
        kw = {"coordinator_address": env["COORDINATOR_ADDRESS"]}
        if env.get("NUM_PROCESSES"):
            kw["num_processes"] = int(env["NUM_PROCESSES"])
        if env.get("PROCESS_ID"):
            kw["process_id"] = int(env["PROCESS_ID"])
        return kw
    if all(k in env for k in ("MASTER_ADDR", "MASTER_PORT", "WORLD_SIZE", "RANK")):
        # reference: _infer_torch_distributed_launch_init (utils.py:77-83)
        if int(env["WORLD_SIZE"]) <= 1:
            return None
        return {
            "coordinator_address": f"{env['MASTER_ADDR']}:{env['MASTER_PORT']}",
            "num_processes": int(env["WORLD_SIZE"]),
            "process_id": int(env["RANK"]),
        }
    if env.get("SLURM_JOB_ID") and int(env.get("SLURM_NTASKS", "1")) > 1:
        # reference: _infer_slurm_init (utils.py:85-141); JAX's SlurmCluster
        # reads SLURM_* itself
        return {}
    if (
        len(env.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1
        or env.get("MEGASCALE_COORDINATOR_ADDRESS")
    ):
        # Cloud TPU pod / multislice metadata — auto-detected by JAX.  A
        # single-entry TPU_WORKER_HOSTNAMES (e.g. "localhost" on a 1-host
        # slice) is NOT a multi-process launch.
        return {}
    return None


def distributed_init(force: bool = False) -> int:
    """Initialize the JAX distributed runtime if the environment says this is
    a multi-process launch (reference: distributed_init, utils.py:242-276).

    Idempotent.  MUST run before the first device access on Cloud TPU pods
    (device enumeration is global).  Returns the process count.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count()
    kw = infer_init_args()
    if kw is None and not force:
        return jax.process_count()
    try:
        jax.distributed.initialize(**(kw or {}))
        _INITIALIZED = True
        logger.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except RuntimeError as e:
        # "already initialized" (e.g. a launcher did it) is fine
        if "already" in str(e).lower():
            _INITIALIZED = True
        else:
            raise
    except ValueError as e:
        if kw:
            raise
        # no-arg auto-detect found cluster-ish env vars but could not
        # resolve a coordinator — treat as single-process rather than
        # killing a working local run
        logger.warning("distributed auto-detect failed (%s); single-process", e)
    return jax.process_count()


def is_master() -> bool:
    """True on the process that owns checkpoint writes and metric sinks
    (reference gates on distributed_rank == 0, utils.py:471)."""
    return jax.process_index() == 0


def num_granules(devices=None) -> int:
    """Number of DCN-connected islands: TPU slices when the platform reports
    slice_index, else host processes (each host's devices share ICI-like
    locality; cross-host is the slow network)."""
    if devices is None:
        devices = jax.devices()
    keys = {getattr(d, "slice_index", d.process_index) for d in devices}
    return len(keys)


def hybrid_device_array(
    sizes: Dict[str, int],
    axis_order,
    devices,
    dcn_axes=("data", "pipeline"),
) -> np.ndarray:
    """Lay devices out so DCN-crossing hops land on data-like axes.

    ``sizes`` are GLOBAL axis sizes.  The granule count (slices/hosts) is
    factored out of the first axis in ``dcn_axes`` it divides — collectives
    on the remaining (model) axes then ride intra-slice ICI only (the
    scaling-book recipe: dp over DCN, tp/fsdp inside the slice).
    """
    from jax.experimental import mesh_utils

    g = num_granules(devices)
    dcn_shape = {ax: 1 for ax in axis_order}
    ici_shape = dict(sizes)
    if g > 1:
        remaining = g
        for ax in dcn_axes:
            if remaining == 1:
                break
            take = _gcd_factor(sizes[ax], remaining)
            if take > 1:
                dcn_shape[ax] = take
                ici_shape[ax] = sizes[ax] // take
                remaining //= take
        if remaining != 1:
            raise ValueError(
                f"{g} slices/hosts cannot be factored onto DCN axes "
                f"{dcn_axes} of mesh {sizes} — give the data (or pipeline) "
                f"axis a multiple of the slice count"
            )
    dev_array = mesh_utils.create_hybrid_device_mesh(
        tuple(ici_shape[ax] for ax in axis_order),
        tuple(dcn_shape[ax] for ax in axis_order),
        devices=devices,
        process_is_granule=not hasattr(devices[0], "slice_index"),
        allow_split_physical_axes=True,
    )
    return np.asarray(dev_array)


def _gcd_factor(size: int, granules: int) -> int:
    import math

    return math.gcd(size, granules)


def global_batch_from_local(batch: Dict, mesh: Mesh, batch_axes=("data", "fsdp")):
    """Assemble global jax.Arrays from this process's local batch shard.

    Single-process: returns the batch untouched (jit's in_shardings handle
    placement).  Multi-process: every array whose dim 0 is the local batch is
    joined across processes along dim 0 (global batch = local * process_count
    in the even-sharding case handled by shard_batches); other leaves are
    treated as replicated and must be identical on all processes.
    """
    if jax.process_count() == 1:
        return batch
    sizes = [int(v.shape[0]) for v in batch.values()
             if hasattr(v, "ndim") and v.ndim >= 1]
    b = max(sizes) if sizes else 0
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == b:
            sh = NamedSharding(mesh, P(batch_axes, *([None] * (v.ndim - 1))))
            out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v))
        elif hasattr(v, "ndim"):
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), np.asarray(v)
            )
        else:
            out[k] = v
    return out
