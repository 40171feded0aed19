import jax.numpy as jnp
import numpy as np

from multimodalvc_tpu.ops.attention import dot_product_attention
from multimodalvc_tpu.ops.ring_attention import ring_attention
from multimodalvc_tpu.parallel import make_mesh


def _qkv(rng, b=2, h=4, t=64, d=16):
    f = lambda: jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    return f(), f(), f()


def test_ring_matches_reference(rng):
    mesh = make_mesh({"sequence": 4, "data": 2})
    q, k, v = _qkv(rng)
    ref = dot_product_attention(q, k, v)
    got = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_ring_causal(rng):
    mesh = make_mesh({"sequence": 4, "data": 2})
    q, k, v = _qkv(rng)
    ref = dot_product_attention(q, k, v, causal=True)
    got = ring_attention(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_ring_kv_len_mask(rng):
    mesh = make_mesh({"sequence": 4, "data": 2})
    q, k, v = _qkv(rng, t=32)
    kv_len = 20
    mask = jnp.arange(32)[None, None, None, :] < kv_len
    ref = dot_product_attention(q, k, v, mask=mask)
    got = ring_attention(q, k, v, mesh, kv_len=jnp.asarray(kv_len))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_encoder_sequence_parallel_matches_serial(rng):
    """TransformerEncoder with sequence_parallel rides the mesh sequence
    axis and reproduces the serial output (long-form AVSR path)."""
    import jax

    from multimodalvc_tpu.nn.layers import TransformerEncoder

    make_mesh({"sequence": 4, "data": 2})  # sets the current mesh
    x = jnp.asarray(rng.standard_normal((2, 64, 32)).astype(np.float32))
    lens = jnp.asarray([64, 40], jnp.int32)
    serial = TransformerEncoder(num_layers=2, num_heads=4, ffn_dim=64)
    ring = TransformerEncoder(num_layers=2, num_heads=4, ffn_dim=64, sequence_parallel=True)
    vs = serial.init(jax.random.PRNGKey(0), x, lengths=lens)
    out_s = serial.apply(vs, x, lengths=lens)
    out_r = jax.jit(lambda v, x: ring.apply(v, x, lengths=lens))(vs, x)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r), rtol=3e-3, atol=3e-3)
    make_mesh({"data": -1})  # restore a plain mesh for other tests
