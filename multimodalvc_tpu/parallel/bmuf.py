"""BMUF — block-wise model-update filtering (Chen & Huo, ICASSP'16).

TPU-native analog of the reference's DP variants (fairseq/fairseq/optim/
bmuf.py and the fairscale slow-momentum wrapper in
models/distributed_fairseq_model.py): data-parallel workers run ``sync_every``
*local* optimizer steps, then reconcile through a block-momentum update of a
global model.  Where the reference wraps torch optimizers and calls
dist.all_reduce, here it is an optax transformation designed to run inside
``shard_map`` over the mesh's data axis — the cross-worker average is one
``lax.pmean`` riding ICI.

Semantics (matching optim/bmuf.py): at a sync point with per-worker params
x_i, global model g, momentum buffer d:
    G   = mean_i(x_i) - g            (block gradient)
    d'  = bm * d + (1 - bm) * lr_b * G
    g'  = g + d'                     (+ bm * d' broadcast under Nesterov)
and every worker restarts from the broadcast model.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class BMUFState(NamedTuple):
    inner: optax.OptState
    step: jnp.ndarray
    global_params: optax.Params
    delta: optax.Updates


def bmuf(
    inner: optax.GradientTransformation,
    sync_every: int = 50,
    block_momentum: float = 0.875,
    block_lr: float = 1.0,
    use_nesterov: bool = True,
    axis_name: Optional[str] = "data",
) -> optax.GradientTransformation:
    """Wrap ``inner`` with BMUF synchronisation.

    Must be used where ``axis_name`` is bound (shard_map/pmap over the data
    axis).  With ``axis_name=None`` it degenerates to local slow-momentum
    (single worker), which is also how it is unit-tested against the maths.
    """

    def init_fn(params):
        return BMUFState(
            inner=inner.init(params),
            step=jnp.zeros((), jnp.int32),
            global_params=jax.tree.map(jnp.asarray, params),
            delta=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("bmuf requires params")
        u, inner_state = inner.update(grads, state.inner, params)
        local_params = optax.apply_updates(params, u)
        step = state.step + 1

        def sync(_):
            avg = local_params
            if axis_name is not None:
                avg = jax.lax.pmean(local_params, axis_name)
            block_grad = jax.tree.map(lambda a, g: a - g, avg, state.global_params)
            new_delta = jax.tree.map(
                lambda d, bg: block_momentum * d + (1.0 - block_momentum) * block_lr * bg,
                state.delta,
                block_grad,
            )
            new_global = optax.apply_updates(state.global_params, new_delta)
            restart = new_global
            if use_nesterov:
                restart = jax.tree.map(
                    lambda g, d: g + block_momentum * d, new_global, new_delta
                )
            return restart, new_global, new_delta

        def no_sync(_):
            return local_params, state.global_params, state.delta

        next_params, new_global, new_delta = jax.lax.cond(
            step % sync_every == 0, sync, no_sync, None
        )
        # optax contract: return the delta to apply to the incoming params
        updates = jax.tree.map(lambda n, p: n - p, next_params, params)
        return updates, BMUFState(
            inner=inner_state, step=step, global_params=new_global, delta=new_delta
        )

    return optax.GradientTransformation(init_fn, update_fn)
