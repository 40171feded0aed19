"""Legacy seq2seq decoder: cached decode == uncached forward; beam decode."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodalvc_tpu.nn.seq2seq import (
    Seq2SeqDecoder,
    Seq2SeqDecoderConfig,
    generate_seq2seq,
)


def _setup(rng, t=6, s=9):
    cfg = Seq2SeqDecoderConfig.tiny()
    dec = Seq2SeqDecoder(cfg)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, t)))
    enc = jnp.asarray(rng.standard_normal((2, s, cfg.d_model)).astype(np.float32))
    enc_lens = jnp.asarray([s, s - 3], jnp.int32)
    vs = dec.init(jax.random.PRNGKey(0), tokens, enc, enc_lens)
    return cfg, dec, tokens, enc, enc_lens, vs


@pytest.mark.slow
def test_cached_decode_matches_full_forward(rng):
    cfg, dec, tokens, enc, enc_lens, vs = _setup(rng)
    t = tokens.shape[1]
    full = dec.apply(vs, tokens, enc, enc_lens)["logits"]

    cache = dec.apply(vs, batch=2, max_len=t, method=Seq2SeqDecoder.init_cache)
    step_logits = []
    for i in range(t):
        out = dec.apply(
            vs, tokens[:, i : i + 1], enc, enc_lens,
            positions=jnp.full((2, 1), i, jnp.int32), cache=cache,
        )
        cache = out["cache"]
        step_logits.append(out["logits"][:, 0])
    stepped = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped), atol=2e-4)


def test_generate_seq2seq_shapes(rng):
    cfg, dec, tokens, enc, enc_lens, vs = _setup(rng)
    seqs, scores = jax.jit(
        lambda e, l: generate_seq2seq(dec, vs, e, l, bos_token_id=0,
                                      max_new_tokens=7, num_beams=3)
    )(enc, enc_lens)
    assert seqs.shape == (2, 3, 7) and scores.shape == (2, 3)
    assert np.all(np.diff(np.asarray(scores), axis=1) <= 1e-5)  # sorted desc
