"""Lightweight/dynamic conv vs a naive per-position loop reference."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodalvc_tpu.ops.dynamic_conv import dynamic_conv, lightweight_conv, shifted_stack


def _naive_dynamic(x, w, padding_left):
    b, t, c = x.shape
    _, _, h, k = w.shape
    d = c // h
    out = np.zeros_like(x)
    for bi in range(b):
        for ti in range(t):
            for hi in range(h):
                for ki in range(k):
                    src = ti + ki - padding_left
                    if 0 <= src < t:
                        out[bi, ti, hi * d : (hi + 1) * d] += (
                            w[bi, ti, hi, ki] * x[bi, src, hi * d : (hi + 1) * d]
                        )
    return out


def test_shifted_stack_indices():
    x = jnp.arange(1, 6, dtype=jnp.float32).reshape(1, 5, 1)
    s = np.asarray(shifted_stack(x, kernel_size=3, padding_left=2))[0, :, :, 0]
    # causal: entry k at position t is x[t + k - 2]
    np.testing.assert_array_equal(s[0], [0, 0, 1])
    np.testing.assert_array_equal(s[4], [3, 4, 5])


def test_dynamic_conv_matches_naive(rng):
    b, t, c, h, k = 2, 7, 8, 4, 3
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    w = rng.standard_normal((b, t, h, k)).astype(np.float32)
    for pad in (k - 1, k // 2):
        got = np.asarray(dynamic_conv(jnp.asarray(x), jnp.asarray(w),
                                      padding_left=pad, softmax=False))
        np.testing.assert_allclose(got, _naive_dynamic(x, w, pad), atol=1e-5)


def test_lightweight_is_tied_dynamic(rng):
    b, t, c, h, k = 2, 6, 8, 2, 5
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    wh = rng.standard_normal((h, k)).astype(np.float32)
    tied = np.broadcast_to(wh, (b, t, h, k))
    got = np.asarray(lightweight_conv(jnp.asarray(x), jnp.asarray(wh)))
    ref = np.asarray(dynamic_conv(jnp.asarray(x), jnp.asarray(tied)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_softmax_weights_preserve_scale(rng):
    x = jnp.ones((1, 10, 4))
    w = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    out = np.asarray(lightweight_conv(x, w, padding_left=1))
    # interior positions: convex combination of ones = 1
    np.testing.assert_allclose(out[0, 1:-1], 1.0, atol=1e-5)


def test_jit_and_grad():
    x = jnp.ones((2, 5, 8))
    w = jnp.ones((2, 5, 4, 3))
    f = jax.jit(lambda x, w: dynamic_conv(x, w).sum())
    g = jax.grad(f)(x, w)
    assert np.isfinite(float(f(x, w))) and np.isfinite(np.asarray(g)).all()


@pytest.mark.slow  # >25 s on a 1-core box; sibling tests cover the module
def test_conformer_conv_type_variants(rng):
    """lightconv/dynamicconv as product Conformer conv-module variants
    (fairseq ships them as CUDA model-zoo kernels; here they are config
    options on the same encoder)."""
    import jax
    import jax.numpy as jnp

    from multimodalvc_tpu.nn.conformer import ConformerConfig, ConformerEncoder

    x = jnp.asarray(rng.standard_normal((2, 12, 144)).astype(np.float32))
    outs = {}
    for ct in ("depthwise", "lightweight", "dynamic"):
        cfg = ConformerConfig.sized("S", conv_type=ct)
        enc = ConformerEncoder(cfg)
        variables = enc.init(jax.random.PRNGKey(0), x)

        def loss_fn(p):
            out = enc.apply({"params": p, "batch_stats": variables["batch_stats"]}, x)
            return jnp.mean(out**2), out

        (loss, out), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
            variables["params"]
        )
        assert out.shape == (2, 12, 144)
        assert np.isfinite(float(loss))
        gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert gsum > 0
        outs[ct] = np.asarray(out)
        if ct == "lightweight":
            assert "light_weights" in variables["params"]["blocks_0"]["conv_module"]
        if ct == "dynamic":
            assert "weight_predictor" in variables["params"]["blocks_0"]["conv_module"]
    assert np.abs(outs["depthwise"] - outs["lightweight"]).max() > 1e-6
