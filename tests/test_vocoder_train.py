import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalvc_tpu.models.vocoder import VocoderConfig, VocoderModel
from multimodalvc_tpu.nn.hifigan import HifiGanConfig
from multimodalvc_tpu.ops.stft import hifigan_log_mel


def tiny_cfg(segment=1600, lr=1e-4):
    return VocoderConfig(
        generator=HifiGanConfig(
            in_channels=128,
            upsample_initial_channel=32,
            upsample_factors=(10, 4, 2, 2),
            upsample_kernel_sizes=(20, 8, 4, 4),
            resblock_kernel_sizes=(3,),
            resblock_dilations=((1, 3, 5),),
        ),
        segment_length=segment,
        lr=lr,
    )


def make_batch(rng, b=2, segment=1600):
    wav = rng.standard_normal((b, segment)).astype(np.float32) * 0.1
    mel = np.asarray(hifigan_log_mel(jnp.asarray(wav)))
    return {"mel": jnp.asarray(mel), "wav": jnp.asarray(wav[..., None])}


@pytest.mark.slow
def test_gan_train_step_runs_and_updates(rng):
    model = VocoderModel(tiny_cfg())
    state = model.init_state(jax.random.PRNGKey(0), mel_frames=10)
    batch = make_batch(rng)
    step = jax.jit(model.train_step)
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    for k in ("loss_gen", "loss_disc", "loss_mel", "loss_fm", "loss_adv"):
        assert np.isfinite(float(metrics[k])), k
    # both param sets actually moved
    g_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), state.gen_params, new_state.gen_params),
    )
    d_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), state.disc_params, new_state.disc_params),
    )
    assert g_delta > 0 and d_delta > 0
    # EMA moved a little toward the new params but not equal to them
    ema_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), state.ema_params, new_state.ema_params),
    )
    assert 0 < ema_delta < g_delta
    # spectral-norm u/v vectors were power-iterated
    sp_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), state.spectral, new_state.spectral),
    )
    assert sp_delta > 0


@pytest.mark.slow
def test_gan_valid_and_generate(rng):
    model = VocoderModel(tiny_cfg())
    state = model.init_state(jax.random.PRNGKey(0), mel_frames=10)
    batch = make_batch(rng)
    metrics = jax.jit(model.valid_step)(state, batch)
    assert np.isfinite(float(metrics["mel_l1"]))
    wav = model.generate(state.gen_params, batch["mel"])
    assert wav.shape == (2, 1600)
    assert np.all(np.abs(np.asarray(wav)) <= 1.0)


@pytest.mark.slow
def test_mel_loss_decreases_on_overfit(rng):
    # a few steps on one batch should reduce the generator mel loss — the
    # smoke-level convergence check the reference gets from its val loop.
    model = VocoderModel(tiny_cfg(lr=1e-3))
    state = model.init_state(jax.random.PRNGKey(0), mel_frames=10)
    batch = make_batch(rng, b=1)
    step = jax.jit(model.train_step)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss_mel"]))
    assert np.mean(losses[-3:]) < losses[0], losses


@pytest.mark.slow  # >25 s on a 1-core box; sibling tests cover the module
def test_torch_checkpoint_unwrap(tmp_path, rng):
    import pytest

    torch = pytest.importorskip("torch")
    # shape-compatible synthetic generator state dict in reference layout
    model = VocoderModel(tiny_cfg())
    state = model.init_state(jax.random.PRNGKey(0), mel_frames=10)
    tstate = {}

    def conv_to_torch(dst, p, transpose):
        tstate[f"{dst}.weight_v"] = torch.from_numpy(np.transpose(np.asarray(p["v"]), transpose).copy())
        tstate[f"{dst}.weight_g"] = torch.from_numpy(
            np.asarray(p["g"]).reshape(-1, 1, 1).copy()
        )
        tstate[f"{dst}.bias"] = torch.from_numpy(np.asarray(p["bias"]).copy())

    gp = state.gen_params
    conv_to_torch("conv_pre", gp["conv_pre"], (2, 1, 0))
    for i in range(4):
        conv_to_torch(f"ups.{i}", gp[f"ups_{i}"], (2, 1, 0))
    for r in range(4):
        for j in range(3):
            for which in ("convs1", "convs2"):
                conv_to_torch(
                    f"resblocks.{r}.{which}.{j}", gp[f"resblocks_{r}"][f"{which}_{j}"], (2, 1, 0)
                )
    conv_to_torch("conv_post", gp["conv_post"], (2, 1, 0))

    # trainer-dict layout with EMA (modelSpeechNoLLM_E2E.py:124-134)
    torch.save({"ema_generator": tstate, "generator": {}}, tmp_path / "v.pt")
    variables = model.import_torch_checkpoint(str(tmp_path / "v.pt"))
    mel = make_batch(rng, b=1)["mel"]
    out_imported = model.generator.apply(variables, mel)
    out_native = model.generator.apply({"params": gp}, mel)
    np.testing.assert_allclose(
        np.asarray(out_imported), np.asarray(out_native), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_sharded_gan_step_matches_single_device(rng):
    """Mesh-DP GAN step == single-device step (VERDICT item: the
    reference trains the vocoder DDP over 8 GPUs,
    scripts/trainGermanVocoder.py:355-428; here GSPMD shards the batch)."""
    from multimodalvc_tpu.cli.train import _shard_gan_loop
    from multimodalvc_tpu.parallel.mesh import make_mesh

    model = VocoderModel(tiny_cfg())
    batch = make_batch(rng, b=4, segment=1600)
    np_batch = {k: np.asarray(v) for k, v in batch.items()}

    ref_state = model.init_state(jax.random.PRNGKey(0), mel_frames=10)
    _, ref_metrics = jax.jit(model.train_step)(ref_state, batch)
    ref_metrics = {k: float(v) for k, v in ref_metrics.items()}

    # 2-way DP keeps the CPU GSPMD compile tractable; the 8-way layout is
    # exercised by dryrun_multichip on the driver side
    mesh = make_mesh({"data": 2}, devices=jax.devices()[:2])
    assert mesh.devices.size == 2
    state = model.init_state(jax.random.PRNGKey(0), mel_frames=10)
    state, step_fn, valid_fn, prep = _shard_gan_loop(
        state, np_batch, mesh, model.train_step, model.valid_step
    )
    # state lives on the mesh (replicated small params = plain DP)
    leaf = jax.tree.leaves(state.gen_params)[0]
    assert leaf.sharding.mesh.devices.size == 2
    sharded_batch = prep(np_batch)
    assert sharded_batch["mel"].sharding.is_fully_replicated is False
    new_state, metrics = step_fn(state, sharded_batch)
    for k, ref in ref_metrics.items():
        assert abs(float(metrics[k]) - ref) < 5e-4 * max(1.0, abs(ref)), (k, ref, float(metrics[k]))
    vm = valid_fn(new_state, prep(np_batch))
    assert np.isfinite(float(vm["mel_l1"]))
