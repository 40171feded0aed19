"""Ancestry-select decode attention (ops/decode_attention.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalvc_tpu.ops.decode_attention import (
    gen_attention_ancestor,
    gen_attention_ancestor_ref,
    merge_softmax_segments,
)


def _brute(q, gen_k, gen_v, anc, valid, beams, scale):
    """Physically gather each row's ancestor KV, then plain attention —
    the semantics the kernel must reproduce without moving the cache."""
    rows, h, d = q.shape
    _, slots, g, _ = gen_k.shape
    rep = h // g
    out = np.zeros((rows, h, d), np.float32)
    m = np.zeros((rows, h), np.float32)
    l = np.zeros((rows, h), np.float32)
    for r in range(rows):
        base = (r // beams) * beams
        ks = np.stack([gen_k[base + anc[r, t], t] for t in range(slots)])  # [L,g,d]
        vs = np.stack([gen_v[base + anc[r, t], t] for t in range(slots)])
        for hh in range(h):
            gg = hh // rep
            s = (ks[:, gg] @ q[r, hh]) * scale  # [L]
            s[valid:] = -1e30
            mm = s.max()
            p = np.exp(s - mm)
            p[valid:] = 0.0
            m[r, hh] = mm
            l[r, hh] = p.sum()
            out[r, hh] = p @ vs[:, gg]
    return out, m, l


@pytest.mark.parametrize("valid", [1, 7, 16])
def test_gen_attention_ancestor_matches_bruteforce(rng, valid):
    b, k, slots, g, rep, d = 3, 4, 16, 2, 3, 32
    rows, h = b * k, g * rep
    q = rng.standard_normal((rows, h, d)).astype(np.float32)
    gk = rng.standard_normal((rows, slots, g, d)).astype(np.float32)
    gv = rng.standard_normal((rows, slots, g, d)).astype(np.float32)
    anc = rng.integers(0, k, (rows, slots)).astype(np.int32)
    scale = 1.0 / np.sqrt(d)

    want = _brute(q, gk, gv, anc, valid, k, scale)
    for name, fn in [
        ("kernel", lambda: gen_attention_ancestor(
            jnp.asarray(q), jnp.asarray(gk), jnp.asarray(gv), jnp.asarray(anc),
            jnp.int32(valid), beams=k, scale=scale, interpret=True)),
        ("ref", lambda: gen_attention_ancestor_ref(
            jnp.asarray(q), jnp.asarray(gk), jnp.asarray(gv), jnp.asarray(anc),
            jnp.int32(valid), beams=k, scale=scale)),
    ]:
        out, m, l = fn()
        np.testing.assert_allclose(np.asarray(m), want[1], rtol=1e-5, atol=1e-5,
                                   err_msg=f"{name} m")
        np.testing.assert_allclose(np.asarray(l), want[2], rtol=1e-5, atol=1e-5,
                                   err_msg=f"{name} l")
        np.testing.assert_allclose(np.asarray(out), want[0], rtol=1e-4, atol=1e-4,
                                   err_msg=f"{name} out")


def test_merge_softmax_segments_equals_joint_softmax(rng):
    """Two-segment merge == softmax over the concatenated scores."""
    n, h, d, la, lb = 4, 3, 8, 5, 7
    sa = rng.standard_normal((n, h, la)).astype(np.float32)
    sb = rng.standard_normal((n, h, lb)).astype(np.float32)
    va = rng.standard_normal((n, h, la, d)).astype(np.float32)
    vb = rng.standard_normal((n, h, lb, d)).astype(np.float32)

    w = jax.nn.softmax(jnp.concatenate([sa, sb], -1), axis=-1)
    want = jnp.einsum("nhl,nhld->nhd", w, jnp.concatenate([va, vb], 2))

    def partial(s, v):
        m = s.max(-1)
        p = np.exp(s - m[..., None])
        return jnp.asarray(np.einsum("nhl,nhld->nhd", p, v)), jnp.asarray(m), jnp.asarray(p.sum(-1))

    oa, ma, lsa = partial(sa, va)
    ob, mb, lsb = partial(sb, vb)
    got = merge_softmax_segments(oa, ma, lsa, ob, mb, lsb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
