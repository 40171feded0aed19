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


def test_gen_attention_int8_kv_matches_ref(rng):
    """int8-KV kernel (VMEM dequant) == jnp oracle on the same int8 inputs
    (exact), and close to the unquantized attention (quantization noise)."""
    from multimodalvc_tpu.ops.decode_attention import quantize_kv

    b, k, slots, g, rep, d = 2, 3, 8, 2, 2, 32
    rows, h = b * k, g * rep
    q = jnp.asarray(rng.standard_normal((rows, h, d)), jnp.float32)
    gk = jnp.asarray(rng.standard_normal((rows, slots, g, d)), jnp.float32)
    gv = jnp.asarray(rng.standard_normal((rows, slots, g, d)), jnp.float32)
    anc = jnp.asarray(rng.integers(0, k, (rows, slots)), jnp.int32)
    scale = 1.0 / np.sqrt(d)
    kq, ks = quantize_kv(gk)
    vq, vs = quantize_kv(gv)

    got = gen_attention_ancestor(
        q, kq, vq, anc, jnp.int32(6), beams=k, scale=scale,
        k_scale=ks, v_scale=vs, interpret=True,
    )
    want = gen_attention_ancestor_ref(
        q, kq, vq, anc, jnp.int32(6), beams=k, scale=scale,
        k_scale=ks, v_scale=vs,
    )
    for a, w, nm in zip(got, want, ("out", "m", "l")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   rtol=1e-5, atol=1e-5, err_msg=nm)
    # vs unquantized: int8 per-vector quantization error only
    exact = gen_attention_ancestor_ref(
        q, gk, gv, anc, jnp.int32(6), beams=k, scale=scale
    )
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(exact[0]),
                               rtol=0.15, atol=0.15)


def test_prompt_attention_matches_ref_and_xla(rng):
    from multimodalvc_tpu.ops.decode_attention import (
        prompt_attention,
        prompt_attention_ref,
        quantize_kv,
    )

    b, k, tp, g, rep, d = 2, 3, 9, 2, 2, 32
    rows, h = b * k, g * rep
    q = jnp.asarray(rng.standard_normal((rows, h, d)), jnp.float32)
    pk = jnp.asarray(rng.standard_normal((b, g, tp, d)), jnp.float32)
    pv = jnp.asarray(rng.standard_normal((b, g, tp, d)), jnp.float32)
    mask = np.ones((b, tp), np.int32)
    mask[1, 6:] = 0
    scale = 1.0 / np.sqrt(d)

    # bf16-path kernel vs oracle vs joint-softmax XLA attention
    got = prompt_attention(q, pk, pv, jnp.asarray(mask), beams=k, scale=scale,
                           interpret=True)
    want = prompt_attention_ref(q, pk, pv, jnp.asarray(mask), beams=k, scale=scale)
    for a, w, nm in zip(got, want, ("out", "m", "l")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   rtol=1e-5, atol=1e-5, err_msg=nm)
    # joint softmax over the prompt only == merged partials with denominator
    qb = np.asarray(q).reshape(b, k, g, rep, d)
    s = np.einsum("bkgrd,bgpd->bkgrp", qb, np.asarray(pk)) * scale
    s[~np.asarray(mask, bool)[:, None, None, None, :].repeat(k, 1).repeat(g, 2).repeat(rep, 3)] = -1e30
    w_ = np.exp(s - s.max(-1, keepdims=True))
    w_ = w_ / w_.sum(-1, keepdims=True)
    ref_out = np.einsum("bkgrp,bgpd->bkgrd", w_, np.asarray(pv)).reshape(rows, h, d)
    norm = np.asarray(got[0]) / np.asarray(got[2])[..., None]
    np.testing.assert_allclose(norm, ref_out, rtol=1e-4, atol=1e-5)

    # int8 path: kernel == oracle exactly on the same quantized inputs
    pkq, pks = quantize_kv(pk)
    pvq, pvs = quantize_kv(pv)
    got_q = prompt_attention(q, pkq, pvq, jnp.asarray(mask), beams=k, scale=scale,
                             k_scale=pks, v_scale=pvs, interpret=True)
    want_q = prompt_attention_ref(q, pkq, pvq, jnp.asarray(mask), beams=k,
                                  scale=scale, k_scale=pks, v_scale=pvs)
    for a, w, nm in zip(got_q, want_q, ("out", "m", "l")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   rtol=1e-5, atol=1e-5, err_msg=nm)


@pytest.mark.slow
def test_generate_beam_kv_quant_end_to_end(rng):
    """ancestry + int8 KV decodes valid sequences on a tiny model and stays
    close to the bf16 decode (same first tokens on a peaked distribution)."""
    from multimodalvc_tpu.nn.llama import LlamaConfig, LlamaModel, generate_beam

    cfg = LlamaConfig.tiny()
    cfg.lora = None
    model = LlamaModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        inputs_embeds=jnp.zeros((1, 4, 64), jnp.float32),
        attn_mask=jnp.ones((1, 4), jnp.int32),
    )
    emb = jnp.asarray(rng.standard_normal((2, 7, 64)) * 0.05, jnp.float32)
    mask = np.ones((2, 7), np.int64)
    mask[1, :3] = 0
    kw = dict(eos_token_id=2, pad_token_id=0, num_beams=3, max_new_tokens=6,
              cache_dtype=jnp.float32, ancestry_reorder=True)
    seqs_bf, _ = generate_beam(model, variables, emb, jnp.asarray(mask), **kw)
    seqs_q, scores_q = generate_beam(
        model, variables, emb, jnp.asarray(mask), kv_quant="int8", **kw
    )
    assert seqs_q.shape == seqs_bf.shape
    assert np.isfinite(np.asarray(scores_q)).all()
    # the first generated token comes from prompt logits (no quantized KV
    # involved) and must agree exactly
    np.testing.assert_array_equal(
        np.asarray(seqs_q[:, 0, 0]), np.asarray(seqs_bf[:, 0, 0])
    )
