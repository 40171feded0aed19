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
    stage_fn: Callable,
    stacked_params: Any,  # leaves [P, ...] — one slice per stage
    x: jnp.ndarray,  # [M, mb, ...] microbatched input
    mesh: Mesh,
    axis: str = "pipeline",
    consts: Any = None,  # optional [M, mb, ...] pytree riding with each microbatch
    batch_axes: tuple = (),  # mesh axes sharding the mb dim (e.g. ("data","fsdp"))
) -> jnp.ndarray:
    """Run x through P chained stages; returns [M, mb, ...] outputs.

    ``stage_fn(params_slice, h[, consts_mb]) -> h`` must preserve the
    activation shape (classic equal-width pipeline).  Microbatch count M
    should be >= P to keep bubble overhead at (P-1)/(M+P-1).  The schedule
    is a lax.scan (not fori_loop) so the whole pipeline is
    reverse-differentiable — training steps backprop through the ppermute
    rotation.  ``consts`` carries per-microbatch side inputs (positions,
    masks) to whichever stage is processing that microbatch.  ``batch_axes``
    composes pipeline with data parallelism: the mb dim of x/consts/outputs
    stays sharded over those axes while params shard over ``axis``.
    """
    n_stages = mesh.shape[axis]
    m = x.shape[0]
    use_consts = consts is not None

    def per_stage(params, xs, cs):
        # params: [1, ...] local slice; xs: [M, mb_local, ...]
        params = jax.tree.map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        n_steps = m + n_stages - 1

        def step_fn(carry, step):
            recv, outputs = carry
            # stage 0 injects microbatch `step` (garbage after M — masked out)
            mb_idx = jnp.clip(step, 0, m - 1)
            inject = xs[mb_idx]
            h_in = jnp.where(stage == 0, inject, recv)
            if not use_consts:
                h_out = stage_fn(params, h_in)
            else:
                # the microbatch at this stage during this step
                my_mb = jnp.clip(step - stage, 0, m - 1)
                c = jax.tree.map(lambda v: v[my_mb], cs)
                h_out = stage_fn(params, h_in, c)
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
            return (recv, outputs), None

        recv0 = jnp.zeros_like(xs[0])
        outputs0 = jnp.zeros_like(xs)
        (_, outputs), _ = jax.lax.scan(
            step_fn, (recv0, outputs0), jnp.arange(n_steps)
        )
        # only the last stage wrote outputs (others stayed zero): psum over
        # the pipeline axis broadcasts them to every rank
        return jax.lax.psum(outputs, axis)

    data_spec = P(None, batch_axes) if batch_axes else P()
    consts_arg = consts if use_consts else {}
    in_specs = (
        jax.tree.map(lambda _: P(axis), stacked_params),
        data_spec,
        jax.tree.map(lambda _: data_spec, consts_arg),
    )
    fn = jax.shard_map(
        per_stage,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=data_spec,
        check_vma=False,
    )
    return fn(stacked_params, x, consts_arg)


def microbatch(x: jnp.ndarray, n_microbatches: int) -> jnp.ndarray:
    """[B, ...] -> [M, B/M, ...]."""
    b = x.shape[0]
    assert b % n_microbatches == 0, (b, n_microbatches)
    return x.reshape((n_microbatches, b // n_microbatches) + x.shape[1:])


def unmicrobatch(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + x.shape[2:])
