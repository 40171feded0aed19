import jax
import jax.numpy as jnp
import numpy as np

from multimodalvc_tpu.nn.conformer import ConformerConfig, ConformerEncoder
from multimodalvc_tpu.nn.modules import MultimodalAttention, Projector, SpeechRatePredictor
from multimodalvc_tpu.nn.qformer import QFormer, QFormerConfig


def test_conformer_shapes_and_masking(rng):
    cfg = ConformerConfig(num_blocks=2, attention_dim=64, attention_heads=4, linear_units=128)
    enc = ConformerEncoder(cfg)
    x = jnp.asarray(rng.standard_normal((2, 30, 48)).astype(np.float32))
    vs = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(vs, x, mutable=["batch_stats"])[0]
    assert out.shape == (2, 30, 64)
    # padding invariance: perturb padded region of sample 1 (valid len 12);
    # the depthwise conv (k=31) leaks ~15 frames, so check the first few
    lengths = jnp.asarray([30, 12])
    o1 = enc.apply(vs, x, lengths=lengths, mutable=["batch_stats"])[0]
    x2 = x.at[1, 28:].set(50.0)
    o2 = enc.apply(vs, x2, lengths=lengths, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(
        np.asarray(o1[0]), np.asarray(o2[0]), rtol=1e-4, atol=1e-4
    )


def test_conformer_sized_lookup():
    for size, (blocks, dim, heads) in {
        "S": (3, 144, 4),
        "M": (4, 256, 4),
        "L": (12, 512, 8),
    }.items():
        cfg = ConformerConfig.sized(size)
        assert (cfg.num_blocks, cfg.attention_dim, cfg.attention_heads) == (blocks, dim, heads)


def test_qformer_query_compression(rng):
    cfg = QFormerConfig(
        num_layers=2, hidden_size=64, num_heads=4, intermediate_size=128,
        encoder_width=96, max_queries=12,
    )
    qf = QFormer(cfg)
    enc_feats = jnp.asarray(rng.standard_normal((3, 40, 96)).astype(np.float32))
    vs = qf.init(jax.random.PRNGKey(0), enc_feats)
    q_lens = jnp.asarray([12, 5, 1])
    e_lens = jnp.asarray([40, 22, 3])
    out = qf.apply(vs, enc_feats, query_lens=q_lens, enc_lens=e_lens)
    assert out.shape == (3, 12, 64)
    # slots past query_lens are zeroed
    assert np.all(np.asarray(out[1, 5:]) == 0)
    assert np.all(np.asarray(out[2, 1:]) == 0)
    assert not np.allclose(np.asarray(out[1, :5]), 0)
    # encoder padding invariance
    enc2 = enc_feats.at[1, 22:].set(123.0)
    out2 = qf.apply(vs, enc2, query_lens=q_lens, enc_lens=e_lens)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]), rtol=1e-4, atol=1e-5)


def test_projector_and_fusion(rng):
    x = jnp.asarray(rng.standard_normal((2, 7, 32)).astype(np.float32))
    proj = Projector(hidden_dim=48, output_dim=16)
    vs = proj.init(jax.random.PRNGKey(0), x)
    assert proj.apply(vs, x).shape == (2, 7, 16)

    fuse = MultimodalAttention(num_heads=4)
    a = jnp.asarray(rng.standard_normal((2, 7, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 7, 32)).astype(np.float32))
    vs = fuse.init(jax.random.PRNGKey(0), a, v)
    assert fuse.apply(vs, a, v).shape == (2, 7, 32)


def test_sr_predictor(rng):
    sr = SpeechRatePredictor(num_layers=2)
    x = jnp.asarray(rng.standard_normal((2, 25, 1024)).astype(np.float32))
    vs = sr.init(jax.random.PRNGKey(0), x)
    out = sr.apply(vs, x)
    assert out.shape == (2, 1)
    assert np.all(np.asarray(out) >= 0)  # ReLU head
