import pytest
import numpy as np
import jax
import jax.numpy as jnp

from multimodalvc_tpu.ops.attention import dot_product_attention, flash_attention


def _rand_qkv(rng, b=2, h=4, tq=256, tk=256, d=64):
    q = rng.standard_normal((b, h, tq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, tk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, tk, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_matches_reference(rng):
    q, k, v = _rand_qkv(rng)
    ref = dot_product_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_causal(rng):
    q, k, v = _rand_qkv(rng, tq=128, tk=128)
    ref = dot_product_attention(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_kv_lens(rng):
    q, k, v = _rand_qkv(rng, b=3, tq=128, tk=384)
    kv_lens = jnp.asarray([100, 384, 17], dtype=jnp.int32)
    mask = (jnp.arange(384)[None, None, None, :] < kv_lens[:, None, None, None])
    ref = dot_product_attention(q, k, v, mask=mask)
    got = flash_attention(q, k, v, kv_lens=kv_lens, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_unaligned_lengths(rng):
    q, k, v = _rand_qkv(rng, tq=100, tk=300)
    ref = dot_product_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_reference_attention_mask_and_bias(rng):
    q, k, v = _rand_qkv(rng, b=1, h=2, tq=8, tk=8, d=16)
    bias = jnp.asarray(rng.standard_normal((1, 1, 8, 8)).astype(np.float32))
    out = dot_product_attention(q, k, v, bias=bias)
    # manual check
    scores = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(16)
    scores = scores + np.asarray(bias)
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    ref = np.einsum("bhqk,bhkd->bhqd", np.asarray(probs), np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_flash_kv_window_left_pad(rng):
    """kv_starts masks a left-pad prefix: window = [start, len) (+causal)."""
    q, k, v = _rand_qkv(rng, b=3, tq=256, tk=256)
    starts = jnp.asarray([0, 130, 37], dtype=jnp.int32)
    cols = jnp.arange(256)[None, None, None, :]
    rows = jnp.arange(256)[None, None, :, None]
    win = (cols >= starts[:, None, None, None]) & (cols <= rows)
    ref = dot_product_attention(q, k, v, mask=win)
    got = flash_attention(q, k, v, kv_starts=starts, causal=True, interpret=True)
    # pad rows (row < start) are fully masked -> kernel emits 0, reference
    # emits a uniform average; compare valid rows only
    valid_row = np.asarray(rows[..., 0] >= starts[:, None, None])[..., None]
    np.testing.assert_allclose(
        np.asarray(got) * valid_row, np.asarray(ref) * valid_row, rtol=2e-3, atol=2e-3
    )
    # fully-masked pad rows must emit EXACT zeros — at multi-kv-block shapes
    # the online-softmax update once returned mean(V) there (s == m == NEG_INF
    # so exp(s - m) = 1 per masked column; caught by the on-TPU tier r5)
    np.testing.assert_array_equal(np.asarray(got) * (~valid_row), 0.0)


@pytest.mark.slow  # flash prefill is off the default path (XLA wins the A/B)
def test_llama_flash_prefill_matches_xla(rng):
    """LlamaAttention's flash prefill path == the XLA einsum path on a
    left-padded prompt (VERDICT: route prefill through the Pallas kernel)."""
    from multimodalvc_tpu.nn.llama import LlamaConfig, LlamaModel

    cfg = LlamaConfig.tiny()
    cfg.head_dim = 64
    cfg.hidden_size = cfg.num_heads * 64
    cfg.intermediate_size = 2 * cfg.hidden_size
    b, t = 2, 160
    emb = jnp.asarray(rng.standard_normal((b, t, cfg.hidden_size)).astype(np.float32))
    # contiguous-suffix left-pad mask (assemble_left_padded semantics)
    n_valid = np.asarray([t, t - 57])
    mask = jnp.asarray((np.arange(t)[None, :] >= (t - n_valid[:, None])).astype(np.int32))

    cfg.use_flash_prefill = False
    model = LlamaModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs_embeds=emb, attn_mask=mask)
    ref = model.apply(variables, inputs_embeds=emb, attn_mask=mask)["logits"]

    cfg2 = LlamaConfig.tiny()
    cfg2.head_dim, cfg2.hidden_size, cfg2.intermediate_size = (
        cfg.head_dim, cfg.hidden_size, cfg.intermediate_size)
    cfg2.use_flash_prefill = True
    model2 = LlamaModel(cfg2)
    got = model2.apply(variables, inputs_embeds=emb, attn_mask=mask)["logits"]
    # compare valid (non-pad) rows only
    vr = np.asarray(mask)[..., None].astype(bool)
    np.testing.assert_allclose(
        np.asarray(got) * vr, np.asarray(ref) * vr, rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
def test_flash_grad_matches_reference(rng):
    """jax.grad through flash_attention (custom VJP, ADVICE r2 high) matches
    grad through the XLA reference path, including causal + left-pad window."""
    q, k, v = _rand_qkv(rng, b=2, h=2, tq=256, tk=256)
    starts = jnp.asarray([0, 64], dtype=jnp.int32)
    cols = jnp.arange(256)[None, None, None, :]
    rows = jnp.arange(256)[None, None, :, None]
    win = (cols >= starts[:, None, None, None]) & (cols <= rows)
    # weight rows so fully-masked (pad) rows do not contribute to the loss,
    # mirroring how the training loss masks padding
    valid_row = (rows[..., 0] >= starts[:, None, None])[..., None]

    def loss_flash(q_, k_, v_):
        o = flash_attention(q_, k_, v_, kv_starts=starts, causal=True, interpret=True)
        return jnp.sum((o * valid_row) ** 2)

    def loss_ref(q_, k_, v_):
        o = dot_product_attention(q_, k_, v_, mask=win)
        return jnp.sum((o * valid_row) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


@pytest.mark.slow  # >25 s on a 1-core box; sibling tests cover the module
def test_llama_train_forward_differentiable(rng):
    """Regression for ADVICE r2 high: the training forward (cache=None) with
    T>=128 and flash explicitly enabled must be differentiable."""
    from multimodalvc_tpu.nn.llama import LlamaConfig, LlamaModel

    cfg = LlamaConfig(
        hidden_size=128, intermediate_size=256, num_layers=1,
        num_heads=2, num_kv_heads=1, head_dim=64, vocab_size=64,
        use_flash_prefill=True,
    )
    model = LlamaModel(cfg, dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 64, size=(2, 128)), dtype=jnp.int32)
    attn_mask = jnp.ones((2, 128), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, attn_mask=attn_mask)

    def loss(p):
        out = model.apply(p, tokens, attn_mask=attn_mask)
        return jnp.mean(out["logits"].astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
