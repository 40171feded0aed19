"""Parity: our Whisper encoder vs a randomly-initialised HF WhisperEncoder."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from multimodalvc_tpu.nn.whisper import (  # noqa: E402
    WhisperEncoder,
    WhisperEncoderConfig,
    import_hf_whisper_encoder,
)


def test_whisper_encoder_matches_hf(rng):
    hf_cfg = transformers.WhisperConfig(
        num_mel_bins=80,
        d_model=384,
        encoder_layers=4,
        encoder_attention_heads=6,
        encoder_ffn_dim=1536,
        max_source_positions=100,
    )
    hf = transformers.models.whisper.modeling_whisper.WhisperEncoder(hf_cfg)
    hf.eval()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    # HF stores embed_positions.weight (the sinusoid table) — ours is computed
    assert "embed_positions.weight" in state
    np.testing.assert_allclose(
        state["embed_positions.weight"],
        np.asarray(
            __import__("multimodalvc_tpu.nn.layers", fromlist=["sinusoidal_positions"]).sinusoidal_positions(100, 384)
        ),
        atol=1e-5,
    )

    cfg = WhisperEncoderConfig(
        n_mels=80, d_model=384, num_layers=4, num_heads=6, ffn_dim=1536, max_frames=100
    )
    variables = import_hf_whisper_encoder(state, cfg)

    mel = rng.standard_normal((2, 80, 200)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(mel)).last_hidden_state.numpy()
    out = jax.jit(WhisperEncoder(cfg).apply)(variables, jnp.asarray(mel))
    assert out.shape == ref.shape == (2, 100, 384)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_whisper_encoder_length_masking(rng):
    cfg = WhisperEncoderConfig(
        n_mels=80, d_model=64, num_layers=2, num_heads=4, ffn_dim=128, max_frames=50
    )
    import jax

    mel = jnp.asarray(rng.standard_normal((2, 80, 100)).astype(np.float32))
    enc = WhisperEncoder(cfg)
    vs = enc.init(jax.random.PRNGKey(0), mel)
    lengths = jnp.asarray([100, 40])
    apply = jax.jit(enc.apply)
    out_masked = apply(vs, mel, lengths=lengths)
    # changing PADDED region of sample 1 must not change its valid outputs
    mel2 = mel.at[1, :, 60:].set(99.0)
    out_masked2 = apply(vs, mel2, lengths=lengths)
    # valid frames: conv stride 2 -> first 20 frames valid for sample 1;
    # conv kernel 3 lets frame 19 peek one step past 40, allow margin
    np.testing.assert_allclose(
        np.asarray(out_masked[1, :18]), np.asarray(out_masked2[1, :18]), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_whisper_encoder_block_padding_equivalence(rng):
    """The encoder pads T>=512 sequences once to the flash block multiple
    (hoisted out of the per-layer kernel); valid rows must be unaffected.
    Same valid content in a 600-frame container (padded to 1024 inside) and
    a 512-frame container (no extra pad) -> identical valid-row outputs."""
    import jax

    cfg = WhisperEncoderConfig(
        n_mels=8, d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
        max_frames=600,
    )
    model = WhisperEncoder(cfg)
    mel_a = rng.standard_normal((2, 8, 1200)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), mel_a[:1])
    lengths = jnp.asarray([1000, 700], jnp.int32)  # 500/350 valid out-frames

    out_a = jax.jit(model.apply)(variables, mel_a, lengths=lengths)  # t=600 -> pad 1024
    cfg_b = WhisperEncoderConfig(
        n_mels=8, d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
        max_frames=512,
    )
    out_b = jax.jit(WhisperEncoder(cfg_b).apply)(
        variables, mel_a[:, :, :1024], lengths=lengths
    )  # t=512, 512-multiple: no extra pad
    np.testing.assert_allclose(
        np.asarray(out_a)[0, :500], np.asarray(out_b)[0, :500], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_a)[1, :350], np.asarray(out_b)[1, :350], rtol=2e-5, atol=2e-5
    )
