"""Trainer on the 8-device virtual mesh: sharded AVSR training steps."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalvc_tpu.config.configs import OptimizationConfig
from multimodalvc_tpu.models.avsr import AVSRConfig, AVSRSystem
from multimodalvc_tpu.parallel import make_mesh
from multimodalvc_tpu.runtime.trainer import Trainer, trainable_mask
from multimodalvc_tpu.runtime.checkpoint import CheckpointManager, filter_frozen

from tests.test_avsr_model import make_batch


def _leaf_paths(tree):
    return {
        "/".join(str(getattr(k, "key", k)) for k in kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_trainable_mask_lora_exception():
    params = {
        "llama": {"q_proj": {"base": {"kernel": jnp.zeros((2, 2))}, "lora_a": jnp.zeros((2, 1))}},
        "qformer": {"w": jnp.zeros((2,))},
    }
    mask = trainable_mask(params, [r"^llama/"])
    assert mask["llama"]["q_proj"]["base"]["kernel"] is False
    assert mask["llama"]["q_proj"]["lora_a"] is True
    assert mask["qformer"]["w"] is True


@pytest.mark.slow
def test_sharded_avsr_training_loss_decreases(rng):
    mesh = make_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    cfg = AVSRConfig.tiny()
    system = AVSRSystem(cfg)
    batch = make_batch(rng, cfg, b=4)
    variables = system.init(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    collections = {k: v for k, v in variables.items() if k != "params"}

    # snapshot before Trainer: donated buffers may alias these arrays
    w0 = jax.tree.map(np.asarray, jax.device_get(params["encoder"]["whisper"]))
    l0 = jax.tree.map(
        np.asarray, jax.device_get(params["llama"]["layers_0"]["self_attn"]["q_proj"])
    )

    opt_cfg = OptimizationConfig(
        lr=3e-3, warmup_updates=2, max_update=50, clip_norm=1.0, update_freq=1
    )
    trainer = Trainer(
        system.make_trainer_loss_fn(),
        params,
        collections,
        opt_cfg,
        mesh=mesh,
        frozen_patterns=system.frozen_patterns(),
    )
    losses = []
    for _ in range(6):
        m = trainer.train_step(batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert trainer.step == 6

    # frozen whisper params unchanged
    w1 = jax.device_get(trainer.state.params["encoder"]["whisper"])
    deltas = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), w0, w1)
    assert max(jax.tree.leaves(deltas)) == 0.0
    # llama base frozen, lora moved
    l1 = jax.device_get(trainer.state.params["llama"]["layers_0"]["self_attn"]["q_proj"])
    assert np.abs(l0["base"]["kernel"] - l1["base"]["kernel"]).max() == 0.0
    assert np.abs(l0["lora_b"] - l1["lora_b"]).max() > 0.0


def test_checkpoint_roundtrip(tmp_path, rng):
    # compact synthetic tree: best/last bookkeeping is what's under test —
    # full-model save/restore runs in the CLI integration tests (a full tiny
    # AVSR tree cost ~25 s of orbax small-leaf IO here for no extra coverage)
    variables = {
        "params": {
            "encoder": {
                "afeat_1d_conv": {
                    "kernel": jnp.asarray(rng.standard_normal((3, 8, 8)), jnp.float32)
                }
            },
            "head": {"w": jnp.ones((4, 4), jnp.bfloat16)},
        },
        "batch_stats": {"bn": {"mean": jnp.zeros((8,))}},
    }

    mgr = CheckpointManager(str(tmp_path / "ckpt"), best_metric="loss")
    mgr.save(variables, step=3, val_metrics={"loss": 1.5})
    mgr.save(variables, step=4, val_metrics={"loss": 2.0})  # not better
    assert mgr.meta["step"] == 4 and mgr.meta["best_value"] == 1.5

    restored = mgr.restore(variables, "checkpoint_best")
    orig = jax.device_get(variables["params"]["encoder"]["afeat_1d_conv"]["kernel"])
    got = restored["params"]["encoder"]["afeat_1d_conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(orig))


def test_filter_frozen_strips_subtrees():
    params = {
        "encoder": {"whisper": {"w": jnp.zeros((2,))}, "qformer": {"w": jnp.ones((2,))}},
        "llama": {"q": {"base": {"kernel": jnp.zeros((2, 2))}, "lora_a": jnp.ones((2, 1))}},
    }
    out = filter_frozen(params, [r"encoder/whisper/", r"base"])
    assert "whisper" not in out["encoder"]
    assert "qformer" in out["encoder"]
    assert "base" not in out["llama"]["q"] and "lora_a" in out["llama"]["q"]


@pytest.mark.parametrize("sched", ["tri_stage", "polynomial", "inverse_sqrt", "cosine", "fixed"])
@pytest.mark.parametrize("opt", ["adamw", "lamb", "nag", "adamax", "adagrad"])
def test_optimizer_scheduler_matrix(sched, opt):
    """Every (optimizer, scheduler) pair builds and takes a finite step."""
    import optax

    from multimodalvc_tpu.config.configs import OptimizationConfig
    from multimodalvc_tpu.runtime.trainer import build_optimizer

    cfg = OptimizationConfig(
        optimizer=opt, lr_scheduler=sched, lr=1e-3, warmup_updates=5, max_update=100
    )
    params = {"w": jnp.ones((4, 4)), "frozen": {"w": jnp.ones((2,))}}
    tx, mask = build_optimizer(cfg, params, frozen_patterns=["frozen"])
    assert mask["w"] and not mask["frozen"]["w"]
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.1), "frozen": {"w": jnp.full((2,), 0.1)}}

    @jax.jit
    def step(grads, state, params):
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(8):
        params, state = step(grads, state, params)
    assert np.isfinite(np.asarray(params["w"])).all()
    assert not np.allclose(np.asarray(params["w"]), 1.0)  # trainable moved
    np.testing.assert_array_equal(np.asarray(params["frozen"]["w"]), 1.0)  # frozen didn't


def test_checkpoint_interval_keep_n(tmp_path):
    import os

    from multimodalvc_tpu.runtime.checkpoint import CheckpointManager

    ckpt = CheckpointManager(
        str(tmp_path), save_interval_updates=10, keep_interval_updates=2
    )
    state = {"w": np.ones(3)}
    for step in (10, 20, 30, 40):
        ckpt.save(state, step, val_metrics={"loss": 1.0 / step})
    names = set(os.listdir(tmp_path))
    assert "checkpoint_30" in names and "checkpoint_40" in names
    assert "checkpoint_10" not in names and "checkpoint_20" not in names
    assert "checkpoint_best" in names and "checkpoint_last" in names
    restored = ckpt.restore({"w": np.zeros(3)}, "checkpoint_last")
    np.testing.assert_array_equal(restored["w"], np.ones(3))


def test_composite_optimizer_routes_groups():
    import optax

    from multimodalvc_tpu.runtime.trainer import build_composite_optimizer

    params = {
        "encoder": {"w": jnp.ones(4)},
        "head": {"w": jnp.ones(4)},
        "other": {"w": jnp.ones(4)},
    }
    tx = build_composite_optimizer(
        [("^encoder/", optax.sgd(0.1)), ("^head/", optax.sgd(1.0))], params
    )
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["encoder"]["w"]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["head"]["w"]), -1.0, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(updates["other"]["w"]), 0.0)  # frozen default


@pytest.mark.slow
def test_reproducibility_same_seed_same_losses(rng):
    """Two trainer runs from the same seed produce identical metrics
    (reference analog: fairseq tests/test_reproducibility.py)."""
    from multimodalvc_tpu.models.avsr import AVSRConfig, AVSRSystem

    def run(seed):
        cfg = AVSRConfig.tiny()
        system = AVSRSystem(cfg)
        batch = make_batch(np.random.default_rng(3), cfg)
        variables = system.init(jax.random.PRNGKey(seed), batch)
        trainer = Trainer(
            system.make_trainer_loss_fn(),
            variables["params"],
            {k: v for k, v in variables.items() if k != "params"},
            OptimizationConfig(lr=1e-3, warmup_updates=1, max_update=10, update_freq=1),
            mesh=None,
            frozen_patterns=system.frozen_patterns(),
        )
        return [float(trainer.train_step(batch)["loss"]) for _ in range(3)]

    a, b = run(0), run(0)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)  # bitwise identical
    c = run(1)
    assert a != c  # different init seed changes the trajectory


def test_triangular_and_manual_schedules():
    import optax

    from multimodalvc_tpu.config.configs import OptimizationConfig
    from multimodalvc_tpu.runtime.trainer import build_optimizer

    params = {"w": jnp.ones((4,))}
    # triangular: peak at warmup, back to floor at 2*warmup
    cfg = OptimizationConfig(lr_scheduler="triangular", lr=1.0, min_lr=0.1,
                             warmup_updates=10, optimizer="sgd", clip_norm=0)
    tx, _ = build_optimizer(cfg, params, [])
    state = tx.init(params)
    g = {"w": jnp.ones((4,))}

    @jax.jit
    def step(state, p, tx=tx):
        u, state = tx.update(g, state, p)
        return state, optax.apply_updates(p, u)

    lrs = []
    p = params
    for _ in range(21):
        prev = p["w"][0]
        state, p = step(state, p)
        lrs.append(float(prev - p["w"][0]))
    assert abs(lrs[10] - 1.0) < 0.1  # peak near step 10
    assert lrs[0] < 0.3 and lrs[20] < 0.3  # floors at the cycle ends

    cfg2 = OptimizationConfig(lr_scheduler="manual", lr=0.5, optimizer="sgd",
                              clip_norm=0, lr_milestones={"5": 0.25, "10": 0.125})
    tx2, _ = build_optimizer(cfg2, params, [])
    state2 = tx2.init(params)

    @jax.jit
    def step2(state, p):
        u, state = tx2.update(g, state, p)
        return state, optax.apply_updates(p, u)

    p = params
    lrs2 = []
    for _ in range(12):
        prev = p["w"][0]
        state2, p = step2(state2, p)
        lrs2.append(round(float(prev - p["w"][0]), 4))
    assert lrs2[0] == 0.5 and lrs2[6] == 0.25 and lrs2[11] == 0.125


def test_load_ensemble_strict_on_missing_member(tmp_path):
    """ADVICE r2 low: a typo'd member of a multi-member ensemble raises under
    strict (default); a single missing name keeps the None fallback."""
    import pytest
    from multimodalvc_tpu.runtime.checkpoint import load_ensemble

    tpl = {"params": {"w": jnp.zeros((2,))}, "collections": {}}
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(tpl, step=1)

    # single missing name -> None (callers fall back to random init)
    assert load_ensemble(mgr, tpl, "nope") is None
    # partial ensemble -> raises under strict
    with pytest.raises(FileNotFoundError):
        load_ensemble(mgr, tpl, "checkpoint_last,nope")
    # non-strict keeps the old skip-with-warning behavior
    got = load_ensemble(mgr, tpl, "checkpoint_last,nope", strict=False)
    assert got is not None and len(got) == 1


def test_reduce_lr_on_plateau_matches_reference_semantics():
    """torch ReduceLROnPlateau semantics (reference:
    optim/lr_scheduler/reduce_lr_on_plateau.py): rel-threshold improvement
    test, shrink by lr_shrink after lr_patience+1 bad validations, counter
    resets after a shrink; the scale lives in opt_state (checkpointable)."""
    import optax

    from multimodalvc_tpu.runtime.trainer import (
        build_optimizer, plateau_update_state,
    )

    cfg = OptimizationConfig(
        lr=1.0, lr_scheduler="reduce_lr_on_plateau", warmup_updates=2,
        lr_shrink=0.5, lr_patience=1, lr_threshold=1e-4, clip_norm=0.0,
        optimizer="sgd", update_freq=1, skip_nonfinite_grads=False,
    )
    params = {"w": jnp.ones((3,))}
    tx, _ = build_optimizer(cfg, params, [])
    opt_state = tx.init(params)

    # warmup: lr ramps linearly 0 -> lr over warmup_updates
    g = {"w": jnp.ones((3,))}
    up0, opt_state = tx.update(g, opt_state, params)
    assert np.allclose(np.asarray(up0["w"]), 0.0)  # step 0: lr = 0
    up1, opt_state = tx.update(g, opt_state, params)
    assert np.allclose(np.asarray(up1["w"]), -0.5)  # step 1: lr = 0.5

    def scale_of(st):
        _, s = plateau_update_state(st, np.nan, cfg)  # probe only
        return s

    # val sequence: 1.0 (first -> best), 1.0 (bad 1), 1.0 (bad 2 > patience
    # -> shrink), 0.5 (improvement -> reset), 0.5, 0.5 (-> shrink again)
    seq = [1.0, 1.0, 1.0, 0.5, 0.5, 0.5]
    scales = []
    for v in seq:
        opt_state, s = plateau_update_state(opt_state, v, cfg)
        scales.append(s)
    assert scales == [1.0, 1.0, 0.5, 0.5, 0.5, 0.25], scales

    # post-warmup update applies lr * scale
    up, opt_state = tx.update(g, opt_state, params)
    assert np.allclose(np.asarray(up["w"]), -1.0 * 0.25)

    # maximize mode flips the comparison
    cfg_max = OptimizationConfig(
        lr=1.0, lr_scheduler="reduce_lr_on_plateau", warmup_updates=0,
        lr_shrink=0.5, lr_patience=0, lr_threshold=1e-4, clip_norm=0.0,
        optimizer="sgd", skip_nonfinite_grads=False, plateau_maximize=True,
    )
    tx2, _ = build_optimizer(cfg_max, params, [])
    st2 = tx2.init(params)
    st2, s = plateau_update_state(st2, 0.8, cfg_max)   # first -> best
    assert s == 1.0
    st2, s = plateau_update_state(st2, 0.9, cfg_max)   # improved
    assert s == 1.0
    st2, s = plateau_update_state(st2, 0.85, cfg_max)  # worse, patience 0
    assert s == 0.5
