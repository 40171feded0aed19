"""Expert-parallel BASE-style layer: balanced token->expert routing.

Reference: fairseq/fairseq/modules/base_layer.py + the C++ auction
(clib/libbase/balanced_assignment.cpp) — one expert FFN per worker, tokens
assigned in a balanced fashion maximizing affinity.

TPU-native design: the reference ships scores to the CPU auction every step;
here routing runs ON DEVICE as Sinkhorn normalization (the S-BASE
formulation of the same balanced-transport problem), so the whole layer
stays inside the jit'd step.  Expert weights are stacked [E, ...] and
sharded over the mesh "expert" axis; the token shuffle is a gather that
GSPMD lowers to an all-to-all over ICI.  The C++ auction remains available
(native.balanced_assignment) for host-side/eval parity checks.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def sinkhorn_route(scores: jnp.ndarray, n_iters: int = 8) -> jnp.ndarray:
    """Balanced soft assignment: [T, E] affinities -> [T, E] transport plan.

    Rows sum to 1 (each token fully assigned), columns to T/E (balance).
    """
    t, e = scores.shape
    log_p = scores - jax.scipy.special.logsumexp(scores, axis=1, keepdims=True)
    for _ in range(n_iters):
        # normalize columns to T/E, then rows to 1 (log domain)
        log_p = log_p - jax.scipy.special.logsumexp(log_p, axis=0, keepdims=True) + jnp.log(t / e)
        log_p = log_p - jax.scipy.special.logsumexp(log_p, axis=1, keepdims=True)
    return jnp.exp(log_p)


class BaseMoELayer(nn.Module):
    """Token-routed expert FFN bank with capacity-balanced dispatch.

    Forward: scores = x @ expert_centroids; Sinkhorn-balance; each token goes
    to its argmax expert under the balanced plan with a fixed per-expert
    capacity C = ceil(T/E * capacity_factor); overflow tokens pass through
    (standard MoE practice — the reference's auction guarantees exactness at
    the cost of a host sync).
    """

    num_experts: int
    ffn_dim: int
    capacity_factor: float = 1.25
    sinkhorn_iters: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, t, d = x.shape
        e = self.num_experts
        tokens = x.reshape(b * t, d)
        n = b * t
        cap = max(int(-(-n // e) * self.capacity_factor), 1)

        centroids = self.param(
            "expert_centroids", nn.initializers.normal(0.02), (d, e)
        )
        scores = (tokens @ centroids.astype(tokens.dtype)).astype(jnp.float32)
        plan = sinkhorn_route(scores, self.sinkhorn_iters)
        expert_idx = jnp.argmax(plan, axis=1)  # [N]
        gate = jnp.take_along_axis(
            jax.nn.softmax(scores, axis=1), expert_idx[:, None], axis=1
        )[:, 0]

        # position of each token within its expert's capacity buffer
        onehot = jax.nn.one_hot(expert_idx, e, dtype=jnp.int32)
        pos_in_expert = jnp.cumsum(onehot, axis=0) * onehot  # [N, E]
        pos = jnp.sum(pos_in_expert, axis=1) - 1  # [N]
        keep = pos < cap

        # scatter tokens into [E, cap, D]
        flat_slot = jnp.where(keep, expert_idx * cap + pos, e * cap)  # overflow -> trash row
        buf = jnp.zeros((e * cap + 1, d), tokens.dtype).at[flat_slot].set(tokens)
        buf = buf[:-1].reshape(e, cap, d)

        # expert FFNs: stacked weights, einsum over the expert axis (sharded
        # over mesh 'expert' by the TRANSFORMER_TP_RULES 'experts' rule)
        w1 = self.param(
            "experts_w1", nn.initializers.he_normal(), (e, d, self.ffn_dim)
        )
        w2 = self.param(
            "experts_w2", nn.initializers.he_normal(), (e, self.ffn_dim, d)
        )
        h = jnp.einsum("ecd,edf->ecf", buf, w1.astype(buf.dtype))
        h = nn.gelu(h, approximate=False)
        h = jnp.einsum("ecf,efd->ecd", h, w2.astype(buf.dtype))

        # gather back
        out = h.reshape(e * cap, d)
        gathered = jnp.where(
            keep[:, None], out[jnp.clip(flat_slot, 0, e * cap - 1)], tokens
        )
        gathered = gathered * gate[:, None].astype(gathered.dtype) + tokens * (
            1.0 - gate[:, None].astype(gathered.dtype)
        )
        return gathered.reshape(b, t, d)
