import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalvc_tpu.criterions.mel import (
    MelL1Config,
    MelL1Criterion,
    compute_mcd,
    compute_ssim,
    masked_l1,
)
from multimodalvc_tpu.models.speech import (
    SpeechConfig,
    SpeechE2EModel,
    SpeechLLMModel,
    SpeechNoLLMModel,
    extract_query_hiddens,
    mel_lengths_from_samples,
)
from multimodalvc_tpu.nn.hifigan import HifiGanConfig


def make_batch(rng, cfg, b=2):
    t_v = cfg.max_video_frames
    n_frames = 2 * cfg.whisper.max_frames
    audio_lengths = np.resize([cfg.max_mel_frames * 160, cfg.max_mel_frames * 80], b)
    return {
        "audio_feats": jnp.asarray(
            rng.standard_normal((b, cfg.whisper.n_mels, n_frames)).astype(np.float32)
        ),
        "video": jnp.asarray(rng.standard_normal((b, t_v, 24, 24, 1)).astype(np.float32)),
        "video_lengths": jnp.asarray(np.resize([t_v, t_v // 2], b), dtype=jnp.int32),
        "instruction": jnp.asarray(rng.integers(1, 200, (b, 4))),
        "audio_lengths": jnp.asarray(audio_lengths, dtype=jnp.int32),
        "target_mel": jnp.asarray(
            rng.standard_normal((b, cfg.max_mel_frames, 128)).astype(np.float32)
        ),
        "target_mel_lengths": jnp.asarray(audio_lengths // 160, dtype=jnp.int32),
        "modality_mode": jnp.asarray(1, dtype=jnp.int32),
    }


def test_extract_query_hiddens(rng):
    hidden = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    q_lens = jnp.asarray([3, 5])
    out = extract_query_hiddens(hidden, q_lens, max_queries=6)
    assert out.shape == (2, 6, 4)
    np.testing.assert_allclose(np.asarray(out[0, :3]), np.asarray(hidden[0, 7:10]))
    assert np.all(np.asarray(out[0, 3:]) == 0)
    np.testing.assert_allclose(np.asarray(out[1, :5]), np.asarray(hidden[1, 5:10]))


def test_mel_lengths():
    assert list(np.asarray(mel_lengths_from_samples(jnp.asarray([16000, 8320, 100])))) == [
        100,
        52,
        1,
    ]


@pytest.mark.slow
def test_speech_llm_forward(rng):
    cfg = SpeechConfig.tiny()
    model = SpeechLLMModel(cfg)
    batch = make_batch(rng, cfg)
    vs = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(vs, batch, mutable=["batch_stats"])[0]
    assert out["melspec"].shape == (2, cfg.max_mel_frames, 128)
    assert np.isfinite(np.asarray(out["melspec"])).all()


@pytest.mark.slow  # >25 s on a 1-core box; sibling tests cover the module
def test_speech_nollm_forward_and_modality_dropout(rng):
    cfg = SpeechConfig.tiny()
    cfg.modality_dropout = True
    model = SpeechNoLLMModel(cfg)
    batch = make_batch(rng, cfg)
    vs = model.init(jax.random.PRNGKey(0), batch, train=True)
    assert "audio_mask_emb" in vs["params"]["encoder"]
    out = model.apply(vs, batch, train=False, mutable=["batch_stats"])[0]
    assert out["melspec"].shape == (2, cfg.max_mel_frames, 128)
    # loss via criterion
    crit = MelL1Criterion(MelL1Config())
    loss, metrics = crit(out, batch, train=False)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["mcd"]))
    assert -1.0 <= float(metrics["ssim"]) <= 1.0
    # audio-masked mode gives different output than av mode when training
    out_av = model.apply(
        vs, {**batch, "modality_mode": jnp.asarray(0)}, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )[0]
    out_vo = model.apply(
        vs, {**batch, "modality_mode": jnp.asarray(1)}, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )[0]
    assert float(jnp.abs(out_av["melspec"] - out_vo["melspec"]).max()) > 1e-6


@pytest.mark.slow
def test_speech_e2e_forward(rng):
    cfg = SpeechConfig.tiny()
    voc = HifiGanConfig(
        in_channels=cfg.head_dim,
        upsample_initial_channel=32,
        upsample_factors=(10, 4, 2, 2),
        upsample_kernel_sizes=(20, 8, 4, 4),
        resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3, 5),),
    )
    model = SpeechE2EModel(cfg, voc)
    batch = make_batch(rng, cfg)
    vs = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(vs, batch, mutable=["batch_stats"])[0]
    assert out["waveform"].shape == (2, cfg.max_mel_frames * 160, 1)
    assert np.abs(np.asarray(out["waveform"])).max() <= 1.0


def test_masked_l1_ignores_padding(rng):
    pred = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    lengths = jnp.asarray([10, 5])
    base = masked_l1(pred, tgt, lengths)
    tgt2 = tgt.at[1, 5:].set(1000.0)
    np.testing.assert_allclose(float(base), float(masked_l1(pred, tgt2, lengths)), rtol=1e-6)


def test_mcd_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((1, 20, 128)).astype(np.float32))
    assert float(compute_mcd(x, x)) < 1e-4
    assert float(compute_ssim(x, x)) > 0.999
