"""GPipe-style pipeline parallelism over the mesh "pipeline" axis.

Reference analog: fairseq's torch Pipe integration
(fairseq/fairseq/model_parallel/models/pipeline_parallel_transformer/,
_pipeline_parallel_pre_init in distributed/utils.py:149-241) which splits a
module list across GPUs with RPC.  TPU-native version: stage parameters are
stacked on a leading axis and sharded over "pipeline"; a shard_map program
runs the classic (M + P - 1)-step schedule, rotating activations between
neighbouring stages with lax.ppermute over ICI.  No host involvement, one
XLA program.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,  # leaves [P, ...] — one slice per stage
    x: jnp.ndarray,  # [M, mb, ...] microbatched input
    mesh: Mesh,
    axis: str = "pipeline",
) -> jnp.ndarray:
    """Run x through P chained stages; returns [M, mb, ...] outputs.

    ``stage_fn(params_slice, h) -> h`` must preserve the activation shape
    (classic equal-width pipeline).  Microbatch count M should be >= P to
    keep bubble overhead at (P-1)/(M+P-1).
    """
    n_stages = mesh.shape[axis]
    m = x.shape[0]

    def per_stage(params, xs):
        # params: [1, ...] local slice; xs: [M, mb, ...] (replicated input)
        params = jax.tree.map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        n_steps = m + n_stages - 1

        def body(step, carry):
            recv, outputs = carry
            # stage 0 injects microbatch `step` (garbage after M — masked out)
            mb_idx = jnp.clip(step, 0, m - 1)
            inject = xs[mb_idx]
            h_in = jnp.where(stage == 0, inject, recv)
            h_out = stage_fn(params, h_in)
            # last stage collects its result for microbatch step-(P-1)
            out_idx = jnp.clip(step - (n_stages - 1), 0, m - 1)
            take = jnp.logical_and(stage == n_stages - 1, step >= n_stages - 1)
            outputs = jax.lax.cond(
                take,
                lambda o: jax.lax.dynamic_update_index_in_dim(o, h_out, out_idx, 0),
                lambda o: o,
                outputs,
            )
            # rotate activations to the next stage
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            recv = jax.lax.ppermute(h_out, axis, perm)
            return recv, outputs

        recv0 = jnp.zeros_like(xs[0])
        outputs0 = jnp.zeros_like(xs)
        _, outputs = jax.lax.fori_loop(0, n_steps, body, (recv0, outputs0))
        # only the last stage wrote outputs (others stayed zero): psum over
        # the pipeline axis broadcasts them to every rank
        return jax.lax.psum(outputs, axis)

    in_specs = (
        jax.tree.map(lambda _: P(axis), stacked_params),
        P(),  # input replicated across pipeline ranks
    )
    fn = jax.shard_map(
        per_stage,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_params, x)


def microbatch(x: jnp.ndarray, n_microbatches: int) -> jnp.ndarray:
    """[B, ...] -> [M, B/M, ...]."""
    b = x.shape[0]
    assert b % n_microbatches == 0, (b, n_microbatches)
    return x.reshape((n_microbatches, b // n_microbatches) + x.shape[1:])


def unmicrobatch(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + x.shape[2:])
