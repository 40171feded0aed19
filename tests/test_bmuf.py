"""BMUF block-momentum DP variant (reference analog:
fairseq/tests/distributed/test_bmuf.py 2-proc convergence, here on the
8-device virtual mesh via shard_map)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from multimodalvc_tpu.parallel import make_mesh
from multimodalvc_tpu.parallel.bmuf import bmuf


def test_bmuf_matches_reference_math():
    """Single-worker (axis_name=None): check the block-momentum recursion."""
    sync, bm, blr = 2, 0.5, 1.0
    tx = bmuf(optax.sgd(0.1), sync_every=sync, block_momentum=bm,
              block_lr=blr, use_nesterov=False, axis_name=None)
    params = {"w": jnp.asarray(1.0)}
    state = tx.init(params)
    g = {"w": jnp.asarray(1.0)}

    # manual: x=1.0, global=1.0, delta=0
    # step1: local x=0.9 (no sync); step2: local x=0.8; sync:
    #   G=0.8-1.0=-0.2; d=0.5*0+0.5*(-0.2)=-0.1; global=0.9; restart x=0.9
    for _ in range(2):
        u, state = tx.update(g, state, params)
        params = optax.apply_updates(params, u)
    np.testing.assert_allclose(float(params["w"]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(float(state.global_params["w"]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(float(state.delta["w"]), -0.1, rtol=1e-6)


def test_bmuf_syncs_workers_on_mesh():
    """Workers with different grads agree exactly at sync points."""
    mesh = make_mesh({"data": 8})
    sync = 3
    tx = bmuf(optax.sgd(0.05), sync_every=sync, block_momentum=0.875, axis_name="data")

    # per-worker distinct gradients (shard the grad array over data)
    grads = jnp.arange(8, dtype=jnp.float32)[:, None] / 8.0 + 0.5  # [8, 1]
    params0 = jnp.ones((8, 1), jnp.float32)

    def worker(p, g):
        state = tx.init(p)
        for _ in range(sync):
            u, state = tx.update(g, state, p)
            p = optax.apply_updates(p, u)
        return p

    run = shard_map(
        worker, mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
    )
    out = np.asarray(jax.jit(run)(params0, grads)).reshape(-1)
    # after the sync step every worker restarts from the same broadcast model
    np.testing.assert_allclose(out, out[0], rtol=1e-6)
    # and it moved (grads are positive -> params decreased)
    assert out[0] < 1.0


def test_bmuf_local_steps_diverge_between_syncs():
    mesh = make_mesh({"data": 8})
    tx = bmuf(optax.sgd(0.05), sync_every=100, axis_name="data")
    grads = jnp.arange(8, dtype=jnp.float32)[:, None] / 8.0 + 0.5
    params0 = jnp.ones((8, 1), jnp.float32)

    def worker(p, g):
        state = tx.init(p)
        for _ in range(2):  # < sync_every: purely local
            u, state = tx.update(g, state, p)
            p = optax.apply_updates(p, u)
        return p

    run = shard_map(worker, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"))
    out = np.asarray(jax.jit(run)(params0, grads)).reshape(-1)
    assert len(np.unique(out.round(6))) == 8  # all workers differ
