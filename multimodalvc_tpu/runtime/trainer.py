"""Trainer: one jit'd, mesh-sharded XLA program per optimizer step.

Replaces the reference's Trainer (fairseq/fairseq/trainer.py:675-910 —
grad-accum loop with no_sync, NCCL all-reduce + multiply_grads, clip,
AMP-overflow retry, XLA compile-count check) with the JAX equivalents:

 * grad accumulation  -> optax.MultiSteps inside the same compiled step;
 * all-reduce         -> pjit/GSPMD inserts psum over the (data, fsdp) axes;
 * fp16 loss scaling  -> unnecessary: bf16 compute + fp32 master params;
 * non-finite grads   -> optax.apply_if_finite (skip-step semantics of the
   reference's overflow retry, trainer.py:827-850);
 * frozen params      -> optax.multi_transform zeroing non-trainable
   subtrees by path regex (reference: requires_grad=False + state_dict
   filtering, src/model.py:96-100,268-271);
 * recompile guard    -> compile-count assertion like trainer.py:1382-1397.
"""
from __future__ import annotations

import logging
import re
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.configs import OptimizationConfig
from ..parallel.mesh import BATCH_AXES
from ..parallel.sharding import infer_param_specs, specs_to_shardings

logger = logging.getLogger(__name__)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    collections: Any  # batch_stats / spectral etc. (mutable model state)
    rng: jnp.ndarray


def path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def trainable_mask(
    params: Any,
    frozen_patterns: List[str],
    always_train_patterns: Optional[List[str]] = None,
) -> Any:
    """True = trainable. A param is frozen if any regex matches its path,
    unless an always-train regex matches (LoRA adapters inside a frozen
    LLM, reference: src/model.py:240-252)."""
    regexes = [re.compile(p) for p in frozen_patterns]
    always = [re.compile(p) for p in (always_train_patterns or ["lora_"])]

    def decide(path, _leaf):
        p = path_str(path)
        if any(rx.search(p) for rx in always):
            return True
        return not any(rx.search(p) for rx in regexes)

    return jax.tree_util.tree_map_with_path(decide, params)


class PlateauState(NamedTuple):
    """State of the reduce-on-plateau LR scale, kept INSIDE opt_state so it
    checkpoints/restores with the optimizer (reference persists
    {best, last_epoch} in its scheduler state_dict)."""

    scale: jnp.ndarray  # f32 multiplier on the post-optimizer update
    best: jnp.ndarray  # f32 best validation value seen
    bad: jnp.ndarray  # i32 validations since last significant improvement


def scale_by_plateau(maximize: bool = False) -> optax.GradientTransformation:
    """Multiply updates by a host-controlled scale (see
    ``plateau_update_state``).  The device side is a plain elementwise scale;
    the plateau DECISION runs on host where the validation metric lives."""

    def init(params):
        del params
        return PlateauState(
            scale=jnp.ones((), jnp.float32),
            best=jnp.asarray(-np.inf if maximize else np.inf, jnp.float32),
            bad=jnp.zeros((), jnp.int32),
        )

    def update(updates, state, params=None):
        del params
        return jax.tree.map(lambda u: u * state.scale, updates), state

    return optax.GradientTransformation(init, update)


def plateau_update_state(opt_state, value: float, opt_cfg: "OptimizationConfig"):
    """Host-side reduce-on-plateau step (torch ReduceLROnPlateau semantics,
    threshold_mode='rel': improvement = value < best*(1-thr), or > best*(1+thr)
    when maximizing; after more than lr_patience bad validations the scale
    shrinks by lr_shrink).  Returns (new_opt_state, new_scale) — a no-op
    (None, 1.0-ish) when no PlateauState is present."""
    found = {}

    def visit(leaf):
        if isinstance(leaf, PlateauState):
            found["s"] = leaf
        return leaf

    jax.tree.map(visit, opt_state, is_leaf=lambda x: isinstance(x, PlateauState))
    if "s" not in found:
        return None, None
    st = found["s"]
    scale = float(np.asarray(jax.device_get(st.scale)))
    best = float(np.asarray(jax.device_get(st.best)))
    bad = int(np.asarray(jax.device_get(st.bad)))
    thr = float(opt_cfg.lr_threshold)
    if opt_cfg.plateau_maximize:
        improved = value > best * (1.0 + thr) if np.isfinite(best) else True
        new_best = max(best, value) if np.isfinite(best) else value
    else:
        improved = value < best * (1.0 - thr) if np.isfinite(best) else True
        new_best = min(best, value) if np.isfinite(best) else value
    if improved:
        bad = 0
    else:
        bad += 1
    if bad > int(opt_cfg.lr_patience):
        scale *= float(opt_cfg.lr_shrink)
        bad = 0
        logger.info("plateau: shrinking lr scale to %.3g", scale)

    def make(x, old):
        arr = jnp.asarray(x, old.dtype)
        try:
            return jax.device_put(arr, old.sharding)
        except Exception:
            return arr

    new_st = PlateauState(
        scale=make(scale, st.scale), best=make(new_best, st.best),
        bad=make(bad, st.bad),
    )

    def replace(leaf):
        return new_st if isinstance(leaf, PlateauState) else leaf

    new_opt = jax.tree.map(
        replace, opt_state, is_leaf=lambda x: isinstance(x, PlateauState)
    )
    return new_opt, scale


def build_optimizer(
    opt_cfg: OptimizationConfig, params: Any, frozen_patterns: List[str]
) -> Tuple[optax.GradientTransformation, Any]:
    """Masked AdamW + cosine schedule + clip + accumulation + finite guard."""
    if opt_cfg.lr_scheduler == "cosine":
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=opt_cfg.lr,
            warmup_steps=max(opt_cfg.warmup_updates, 1),
            decay_steps=max(opt_cfg.max_update, opt_cfg.warmup_updates + 1),
            end_value=opt_cfg.min_lr,
        )
    elif opt_cfg.lr_scheduler == "inverse_sqrt":
        warm = max(opt_cfg.warmup_updates, 1)

        def schedule(step):
            step = jnp.maximum(step, 1)
            warm_lr = opt_cfg.lr * step / warm
            decay_lr = opt_cfg.lr * jnp.sqrt(warm / step)
            return jnp.where(step < warm, warm_lr, decay_lr)

    elif opt_cfg.lr_scheduler == "tri_stage":
        # warmup -> hold -> exponential decay (reference:
        # fairseq/fairseq/optim/lr_scheduler/tri_stage_lr_scheduler.py);
        # phase_ratio splits max_update like the reference's cfg.phase_ratio
        total = max(opt_cfg.max_update, 1)
        if opt_cfg.phase_ratio is not None:
            r = opt_cfg.phase_ratio
            warm = max(int(r[0] * total), 1)
            hold = max(int(r[1] * total), 0)
            decay = max(int(r[2] * total), 1)
        else:
            warm = max(opt_cfg.warmup_updates, 1)
            hold = max(int(0.4 * total) - warm, 0)
            decay = max(total - warm - hold, 1)
        final_scale = max(opt_cfg.min_lr / max(opt_cfg.lr, 1e-12), 1e-8)

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            warm_lr = opt_cfg.lr * step / warm
            hold_lr = jnp.asarray(opt_cfg.lr, jnp.float32)
            frac = jnp.clip((step - warm - hold) / decay, 0.0, 1.0)
            decay_lr = opt_cfg.lr * jnp.exp(jnp.log(final_scale) * frac)
            return jnp.where(step < warm, warm_lr, jnp.where(step < warm + hold, hold_lr, decay_lr))

    elif opt_cfg.lr_scheduler == "polynomial":
        schedule = optax.polynomial_schedule(
            init_value=0.0 if opt_cfg.warmup_updates else opt_cfg.lr,
            end_value=opt_cfg.min_lr,
            power=1.0,
            transition_steps=max(opt_cfg.max_update, 1),
            transition_begin=opt_cfg.warmup_updates,
        )
        if opt_cfg.warmup_updates:
            schedule = optax.join_schedules(
                [
                    optax.linear_schedule(0.0, opt_cfg.lr, opt_cfg.warmup_updates),
                    optax.polynomial_schedule(
                        init_value=opt_cfg.lr,
                        end_value=opt_cfg.min_lr,
                        power=1.0,
                        transition_steps=max(opt_cfg.max_update - opt_cfg.warmup_updates, 1),
                    ),
                ],
                [opt_cfg.warmup_updates],
            )
    elif opt_cfg.lr_scheduler == "triangular":
        # cyclical LR between min_lr and lr with per-cycle peak shrink
        # (reference: optim/lr_scheduler/triangular_lr_scheduler.py —
        # cycle = floor(t / period); max_lr *= lr_shrink**cycle;
        # lr = min_lr + (max_lr - min_lr) * max(0, 1 - |t/half - 2(cycle+1) + 1|)
        period = max(opt_cfg.lr_period_updates, 0) or 2 * max(opt_cfg.warmup_updates, 1)
        half = period / 2.0
        shrink = float(opt_cfg.lr_shrink)

        def schedule(step):
            t = jnp.asarray(step, jnp.float32)
            cycle = jnp.floor(t / period)
            peak = opt_cfg.lr * jnp.power(shrink, cycle)
            x = jnp.abs(t / half - 2.0 * (cycle + 1.0) + 1.0)
            tri = jnp.maximum(0.0, 1.0 - x)
            return opt_cfg.min_lr + jnp.maximum(peak - opt_cfg.min_lr, 0.0) * tri

    elif opt_cfg.lr_scheduler == "manual":
        # piecewise-constant from lr_milestones {step: lr} (reference:
        # optim/lr_scheduler/manual_lr_scheduler.py)
        points = sorted((int(k), float(v)) for k, v in (opt_cfg.lr_milestones or {}).items())
        bounds = jnp.asarray([p[0] for p in points], jnp.int32)
        values = jnp.asarray([opt_cfg.lr] + [p[1] for p in points], jnp.float32)

        def schedule(step):
            idx = jnp.sum(jnp.asarray(step, jnp.int32) >= bounds)
            return values[idx]

    elif opt_cfg.lr_scheduler == "fixed":
        schedule = optax.constant_schedule(opt_cfg.lr)
    elif opt_cfg.lr_scheduler == "reduce_lr_on_plateau":
        # linear warmup to lr, then constant x a host-driven plateau scale
        # (reference: optim/lr_scheduler/reduce_lr_on_plateau.py — torch
        # ReduceLROnPlateau semantics; the scale lives in opt_state via
        # scale_by_plateau so it checkpoints/resumes with the optimizer)
        warm = max(opt_cfg.warmup_updates, 0)

        def schedule(step):
            if warm == 0:
                return jnp.asarray(opt_cfg.lr, jnp.float32)
            s = jnp.asarray(step, jnp.float32)
            return opt_cfg.lr * jnp.minimum(s / warm, 1.0)

    else:
        raise ValueError(f"unknown lr_scheduler {opt_cfg.lr_scheduler}")

    if opt_cfg.optimizer == "adamw":
        base = optax.adamw(
            schedule,
            b1=opt_cfg.adam_betas[0],
            b2=opt_cfg.adam_betas[1],
            eps=opt_cfg.adam_eps,
            weight_decay=opt_cfg.weight_decay,
        )
    elif opt_cfg.optimizer == "adam":
        base = optax.adam(
            schedule, b1=opt_cfg.adam_betas[0], b2=opt_cfg.adam_betas[1], eps=opt_cfg.adam_eps
        )
    elif opt_cfg.optimizer == "adafactor":
        base = optax.adafactor(schedule)
    elif opt_cfg.optimizer == "lamb":
        base = optax.lamb(
            schedule, b1=opt_cfg.adam_betas[0], b2=opt_cfg.adam_betas[1],
            eps=opt_cfg.adam_eps, weight_decay=opt_cfg.weight_decay,
        )
    elif opt_cfg.optimizer == "adagrad":
        base = optax.adagrad(schedule)
    elif opt_cfg.optimizer == "adamax":
        base = optax.adamax(
            schedule, b1=opt_cfg.adam_betas[0], b2=opt_cfg.adam_betas[1], eps=opt_cfg.adam_eps
        )
    elif opt_cfg.optimizer == "nag":
        base = optax.sgd(schedule, momentum=0.99, nesterov=True)
    elif opt_cfg.optimizer == "sgd":
        base = optax.sgd(schedule)
    else:
        raise ValueError(f"unknown optimizer {opt_cfg.optimizer}")

    chain = [base]
    if opt_cfg.clip_norm and opt_cfg.clip_norm > 0:
        chain.insert(0, optax.clip_by_global_norm(opt_cfg.clip_norm))
    if opt_cfg.lr_scheduler == "reduce_lr_on_plateau":
        if opt_cfg.lr_shrink >= 1.0:
            logger.warning(
                "reduce_lr_on_plateau with lr_shrink=%.3g never reduces — "
                "set optimization.lr_shrink (reference default: 0.1)",
                opt_cfg.lr_shrink,
            )
        chain.append(scale_by_plateau(maximize=opt_cfg.plateau_maximize))
    tx = optax.chain(*chain)

    mask = trainable_mask(params, frozen_patterns)
    n_train = sum(
        int(np.prod(l.shape))
        for l, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask))
        if m
    )
    n_total = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    logger.info(
        "trainable params: %.2fM / %.2fM (%.2f%%)",
        n_train / 1e6,
        n_total / 1e6,
        100.0 * n_train / max(n_total, 1),
    )
    tx = optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda m: "train" if m else "freeze", mask),
    )
    if opt_cfg.skip_nonfinite_grads:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=25)
    if opt_cfg.update_freq > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=opt_cfg.update_freq)
    return tx, mask


def build_composite_optimizer(
    groups: List[Tuple[str, optax.GradientTransformation]],
    params: Any,
    default: Optional[optax.GradientTransformation] = None,
) -> optax.GradientTransformation:
    """Route param subtrees to different optimizers by path regex
    (reference: fairseq/fairseq/optim/composite.py — per-group optimizers
    keyed by parameter group names).  First matching regex wins; unmatched
    params use ``default`` (or are frozen)."""
    regexes = [(re.compile(rx), i) for i, (rx, _) in enumerate(groups)]

    def assign(path, _leaf):
        p = path_str(path)
        for rx, i in regexes:
            if rx.search(p):
                return f"g{i}"
        return "default"

    labels = jax.tree_util.tree_map_with_path(assign, params)
    transforms = {f"g{i}": tx for i, (_, tx) in enumerate(groups)}
    transforms["default"] = default if default is not None else optax.set_to_zero()
    return optax.multi_transform(transforms, labels)


@dataclass
class CompileGuard:
    """Warn/raise when the step function recompiles too often
    (reference analog: trainer.py:1382-1397 XLA compile-count check)."""

    max_compilations: int = 4
    count: int = 0

    def bump(self, fn) -> None:
        # jax caches by signature; track via fn._cache_size when available
        try:
            size = fn._cache_size()
        except Exception:
            return
        if size > self.count:
            self.count = size
            if size > self.max_compilations:
                logger.warning(
                    "step function compiled %d times — check for shape "
                    "instability (bucketing misconfigured?)",
                    size,
                )


class Trainer:
    """Generic loss-driven trainer over a (model_apply, criterion) pair."""

    def __init__(
        self,
        loss_fn: Callable,  # (params, collections, batch, rng) -> (loss, (metrics, new_collections))
        params: Any,
        collections: Any,
        opt_cfg: OptimizationConfig,
        mesh: Optional[Mesh] = None,
        frozen_patterns: Optional[List[str]] = None,
        max_compilations: int = 10,
        donate: bool = True,
    ):
        self.loss_fn = loss_fn
        self.opt_cfg = opt_cfg
        self.mesh = mesh
        self.tx, self.mask = build_optimizer(opt_cfg, params, frozen_patterns or [])
        self._any_frozen = not all(jax.tree.leaves(self.mask))
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            collections=collections,
            rng=jax.random.PRNGKey(0),
        )
        if mesh is not None:
            param_specs = infer_param_specs(params, mesh)
            state_specs = TrainState(
                step=P(),
                params=param_specs,
                opt_state=jax.tree.map(
                    lambda _: P(), state.opt_state, is_leaf=lambda x: hasattr(x, "shape")
                ),
                collections=jax.tree.map(lambda _: P(), collections),
                rng=P(),
            )
            # opt_state mirrors param sharding where shapes coincide
            state_specs = state_specs.replace(
                opt_state=_mirror_opt_specs(state.opt_state, params, param_specs)
            )
            self.state_shardings = jax.tree.map(
                lambda s: NamedSharding(mesh, s),
                state_specs,
                is_leaf=lambda x: isinstance(x, P),
            )
            state = jax.device_put(state, self.state_shardings)
            batch_sharding = NamedSharding(mesh, P(BATCH_AXES))
            self._train_step = jax.jit(
                self._step_impl,
                in_shardings=(self.state_shardings, batch_sharding),
                out_shardings=(self.state_shardings, None),
                donate_argnums=(0,) if donate else (),
            )
        else:
            self._train_step = jax.jit(self._step_impl, donate_argnums=(0,) if donate else ())
        self.state = state
        self.guard = CompileGuard(max_compilations)

    def _step_impl(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, step_rng = jax.random.split(state.rng)

        def lf(p):
            # stop_gradient on frozen leaves: the optimizer mask alone only
            # zeroes the UPDATE — the backward still computes dW for every
            # frozen matmul (the LLaMA trunk is ~98% of params).  Cutting the
            # weight-grad here lets XLA DCE those matmuls, and matches the
            # reference where frozen params have requires_grad=False so
            # grad-norm/clipping only ever see trainable grads.
            if self._any_frozen:
                p = jax.tree.map(
                    lambda x, m: x if m else jax.lax.stop_gradient(x),
                    p,
                    self.mask,
                )
            return self.loss_fn(p, state.collections, batch, step_rng)

        (loss, (metrics, new_colls)), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics)
        metrics["gnorm"] = gnorm
        metrics["loss"] = loss
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            collections=new_colls if new_colls is not None else state.collections,
            rng=rng,
        )
        return new_state, metrics

    def train_step(self, batch) -> Dict[str, float]:
        self.state, metrics = self._train_step(self.state, batch)
        self.guard.bump(self._train_step)
        return metrics

    def plateau_step(self, value: float) -> Optional[float]:
        """Feed a validation metric to the reduce-on-plateau scheduler
        (no-op unless lr_scheduler == reduce_lr_on_plateau).  Returns the
        current LR scale."""
        new_opt, scale = plateau_update_state(
            self.state.opt_state, float(value), self.opt_cfg
        )
        if new_opt is not None:
            self.state = self.state.replace(opt_state=new_opt)
        return scale

    @property
    def step(self) -> int:
        return int(self.state.step)


def gan_state_shardings(state, mesh: Mesh):
    """NamedShardings for a dual-optimizer GAN train state
    (models/vocoder.py GanTrainState or criterions/gan.py E2EGanState).

    Params/EMA get the standard rule-based specs (FSDP fallback shards big
    weights, small conv stacks stay replicated = plain DP, matching the
    reference's DDP vocoder training, scripts/trainGermanVocoder.py:355-428);
    optimizer moments mirror their params; scalars/rng/mutables replicate.
    """
    gen_specs = infer_param_specs(state.gen_params, mesh)
    disc_specs = infer_param_specs(state.disc_params, mesh)
    repl = lambda tree: jax.tree.map(lambda _: P(), tree)
    kw = dict(
        step=P(),
        gen_params=gen_specs,
        disc_params=disc_specs,
        spectral=repl(state.spectral),
        gen_opt=_mirror_opt_specs(state.gen_opt, state.gen_params, gen_specs),
        disc_opt=_mirror_opt_specs(state.disc_opt, state.disc_params, disc_specs),
    )
    if hasattr(state, "ema_params"):
        kw["ema_params"] = gen_specs
    if hasattr(state, "collections"):
        kw["collections"] = repl(state.collections)
    if hasattr(state, "rng"):
        kw["rng"] = P()
    specs = state.replace(**kw)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P)
    )


def gan_batch_shardings(batch, mesh: Mesh):
    """Per-leaf batch shardings: dim 0 over (data, fsdp), scalars replicated."""
    return jax.tree.map(
        lambda x: NamedSharding(
            mesh, P(BATCH_AXES) if getattr(x, "ndim", np.ndim(x)) >= 1 else P()
        ),
        batch,
    )


def _mirror_opt_specs(opt_state, params, param_specs):
    """Give optimizer moments the same sharding as their params (ZeRO-ish:
    with fsdp>1 the moments are sharded exactly like the weights).

    Moments live in the optimizer state as subtrees whose leaf paths END
    WITH the param's own tree path (e.g. .../mu/encoder/layer_0/kernel), so
    matching is by path-suffix + shape — two distinct params with identical
    shapes (q_proj vs o_proj under TP) cannot alias each other's spec."""
    param_paths = []  # (path string, shape, spec)
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(
        param_specs, is_leaf=lambda x: isinstance(x, P)
    )[0]
    for (kp, leaf), (_, spec) in zip(flat_p, flat_s):
        param_paths.append((path_str(kp), getattr(leaf, "shape", None), spec))
    # longest paths first so a path that happens to be another's suffix
    # (never the case for full param paths, but cheap insurance) wins
    param_paths.sort(key=lambda t: -len(t[0]))

    def assign(kp, leaf):
        if not hasattr(leaf, "shape"):
            return P()
        p = path_str(kp)
        for ppath, shape, spec in param_paths:
            if leaf.shape == shape and (
                p == ppath
                or (p.endswith(ppath) and p[-len(ppath) - 1] == "/")
            ):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(assign, opt_state)
