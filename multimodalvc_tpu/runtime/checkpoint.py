"""Checkpointing: orbax for native state, policies for best/last/keep-N.

Reference: fairseq/fairseq/checkpoint_utils.py:33-269 (save policies, resume
with iterator restore, arg_overrides) and src/model.py:268-271 (frozen params
excluded from product checkpoints).  Orbax gives async array writes (the
reference's iopath async path) and sharded restore on meshes for free.
"""
from __future__ import annotations

import json
import logging
import os
import re
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _kp_str(kp) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)


def _swap_dirs(tmp: str, path: str) -> None:
    """Atomically replace ``path`` with ``tmp``: the old copy is moved aside
    before the rename and only deleted afterwards, so every instant has a
    complete checkpoint at ``path`` or ``path.old``."""
    old = path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def _select_like(template: Any, raw: Any) -> Any:
    """Pick template-shaped leaves out of a (possibly larger) restored tree.
    Orbax restores dicts with string keys; tuples/lists in the template
    (e.g. optax states) come back as list-structured nodes."""
    if isinstance(template, dict):
        if not isinstance(raw, dict):
            raise KeyError(f"expected mapping, got {type(raw)}")
        return {k: _select_like(v, raw[k]) for k, v in template.items()}
    if isinstance(template, (tuple, list)) or hasattr(template, "_fields"):
        if raw is None:
            # orbax collapses leafless subtrees (EmptyState, all-None nodes)
            if not jax.tree_util.tree_leaves(template):
                return template
            raise KeyError("checkpoint missing a non-empty subtree")
        children = list(template)
        if isinstance(raw, dict):
            # orbax keys namedtuples by field name, plain sequences by index
            if hasattr(template, "_fields") and all(f in raw for f in template._fields):
                raw_children = [raw[f] for f in template._fields]
            else:
                raw_children = [raw[str(i)] for i in range(len(children))]
        else:
            raw_children = list(raw)
        vals = [_select_like(c, r) for c, r in zip(children, raw_children)]
        if hasattr(template, "_fields"):  # namedtuple (optax states)
            return type(template)(*vals)
        return type(template)(vals) if isinstance(template, list) else tuple(vals)
    if template is None:
        return None
    return np.asarray(raw)


class CheckpointManager:
    """best/last/interval checkpoints + metadata + resume."""

    def __init__(
        self,
        save_dir: str,
        best_metric: str = "loss",
        maximize: bool = False,
        keep_best: int = 1,
        async_save: bool = True,
        save_interval_updates: int = 0,
        keep_interval_updates: int = -1,
    ):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self.best_metric = best_metric
        self.maximize = maximize
        self.keep_best = keep_best
        self.save_interval_updates = save_interval_updates
        self.keep_interval_updates = keep_interval_updates
        self.best_value: Optional[float] = None
        self._ckptr = None
        self._async = None
        if _HAVE_ORBAX:
            if async_save:
                # async array writes (reference analog: iopath async path,
                # fairseq/fairseq/checkpoint_utils.py:485) — the save call
                # returns once arrays are snapshotted; serialization runs in
                # a background thread and is joined before the next write.
                try:
                    self._async = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
                except Exception:
                    self._async = None
            self._ckptr = ocp.PyTreeCheckpointer()
        self._pending: List[tuple] = []  # (tmp_path, final_path) async swaps
        # clean stray .tmp/.old dirs from a crashed earlier run — the final
        # checkpoints are intact by construction (_write swaps after commit)
        for n in os.listdir(self.save_dir):
            if n.endswith(".tmp") or n.endswith(".old"):
                shutil.rmtree(os.path.join(self.save_dir, n), ignore_errors=True)
        self._meta_path = os.path.join(self.save_dir, "meta.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            self.best_value = meta.get("best_value")

    def _path(self, name: str) -> str:
        return os.path.join(self.save_dir, name)

    def save(
        self,
        state: Any,
        step: int,
        val_metrics: Optional[Dict[str, float]] = None,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        multiproc = jax.process_count() > 1
        if multiproc:
            # multi-host: leaves may be sharded across processes and not
            # addressable for a plain device_get — gather to every host,
            # then only rank 0 writes (reference gates checkpoint writes on
            # distributed rank).  Every rank runs the best/meta bookkeeping
            # so patience decisions and subsequent restores agree.
            from jax.experimental import multihost_utils

            state = multihost_utils.process_allgather(state)
        writer = not multiproc or jax.process_index() == 0
        tree = jax.tree.map(np.asarray, jax.device_get(state))
        if writer:
            self._write(tree, "checkpoint_last")
        improved = False
        if val_metrics and self.best_metric in val_metrics:
            v = float(val_metrics[self.best_metric])
            better = (
                self.best_value is None
                or (v > self.best_value if self.maximize else v < self.best_value)
            )
            if better:
                self.best_value = v
                if writer:
                    self._write(tree, "checkpoint_best")
                improved = True
        if self.save_interval_updates and step % self.save_interval_updates == 0 and writer:
            self._write(tree, f"checkpoint_{step}")
            self.wait()  # finalize before pruning so keep-N sees a consistent dir
            self._prune_interval()
        meta = {
            "step": step,
            "best_value": self.best_value,
            "best_metric": self.best_metric,
            **(extra or {}),
        }
        if writer:
            with open(self._meta_path, "w") as f:
                json.dump(meta, f)
        if multiproc:
            # barrier: no rank resumes training (and possibly crashes /
            # restarts) before the checkpoint files exist
            multihost_utils.sync_global_devices("mmvc_checkpoint_save")
        logger.info(
            "saved checkpoint step=%d%s", step, " (new best)" if improved else ""
        )

    def _prune_interval(self) -> None:
        """Delete all but the newest `keep_interval_updates` step checkpoints
        (reference: fairseq/fairseq/checkpoint_utils.py:138-178 keep-N)."""
        if self.keep_interval_updates < 0:
            return
        rx = re.compile(r"^checkpoint_(\d+)$")
        steps = sorted(
            int(m.group(1))
            for m in (rx.match(n) for n in os.listdir(self.save_dir))
            if m
        )
        for s in steps[: max(0, len(steps) - self.keep_interval_updates)]:
            shutil.rmtree(self._path(f"checkpoint_{s}"), ignore_errors=True)

    def _write(self, tree: Any, name: str) -> None:
        """Crash-safe write: save to a ``.tmp`` sibling, then atomically swap
        over the old checkpoint once the save is finalized.  A crash mid-save
        leaves the previous checkpoint_last/checkpoint_best intact (the
        stray .tmp is cleaned up on the next run)."""
        path = self._path(name)
        tmp = path + ".tmp"
        if self._async is not None:
            # join + swap any in-flight write FIRST (it may still be writing
            # into this same .tmp), only then clear strays and start the next
            self._finalize_pending()
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            self._async.save(tmp, tree)
            self._pending.append((tmp, path))
            return
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if self._ckptr is not None:
            self._ckptr.save(tmp, tree)
        else:  # numpy fallback: arrays keyed by tree path
            os.makedirs(tmp, exist_ok=True)
            flat = {
                _kp_str(kp): leaf
                for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
            }
            np.savez(os.path.join(tmp, "arrays.npz"), **flat)
        _swap_dirs(tmp, path)

    def _finalize_pending(self) -> None:
        if self._async is not None:
            self._async.wait_until_finished()
        while self._pending:
            tmp, path = self._pending.pop(0)
            _swap_dirs(tmp, path)

    def restore(self, template: Any, name: str = "checkpoint_last") -> Optional[Any]:
        """Restore ``template``'s leaves from the checkpoint.  The template
        may be a SUBTREE of what was saved (eval restores params only from a
        full trainer state) — extra saved keys are ignored."""
        self.wait()
        path = self._path(name)
        if not os.path.exists(path):
            return None
        if self._ckptr is not None:
            raw = self._ckptr.restore(path)  # itemless: full saved tree
            return _select_like(template, raw)

        npz = np.load(os.path.join(path, "arrays.npz"))
        flat_t = jax.tree_util.tree_flatten_with_path(template)
        out = []
        for kp, leaf in flat_t[0]:
            key = _kp_str(kp)
            if key not in npz:
                raise KeyError(f"checkpoint {name} missing {key}")
            out.append(npz[key])
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), out
        )

    def wait(self) -> None:
        """Block until any in-flight async write has committed (and swapped
        into its final path)."""
        self._finalize_pending()

    @property
    def meta(self) -> Dict[str, Any]:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {}


def average_checkpoints(trees: List[Any]) -> Any:
    """Uniform parameter averaging over same-structure trees (reference:
    fairseq/scripts/average_checkpoints.py).  Integer leaves (step counters)
    keep the last tree's value."""
    if len(trees) == 1:
        return trees[0]

    def avg(*leaves):
        a = np.asarray(leaves[0])
        if not np.issubdtype(a.dtype, np.floating):
            return np.asarray(leaves[-1])
        return np.mean(np.stack([np.asarray(l, np.float64) for l in leaves]), axis=0).astype(
            a.dtype
        )

    return jax.tree.map(avg, *trees)


def load_ensemble(
    manager: "CheckpointManager", template: Any, restore_file: str, mode: str = "logprob",
    strict: bool = True,
) -> Optional[List[Any]]:
    """Restore one or more checkpoints named in a comma-separated
    ``restore_file`` (reference: load_model_ensemble_and_task,
    checkpoint_utils.py:380).  mode="average" collapses members into a
    single parameter-averaged tree; "logprob" returns the list for
    ensemble decoding.

    The member list is explicit user input: with ``strict`` (default) a
    missing member of a multi-member ensemble raises instead of silently
    evaluating a smaller ensemble (a typo in one name would otherwise just be
    a warning in the eval log).  A single missing name still returns None so
    callers keep their no-checkpoint fallback."""
    names = [n.strip() for n in restore_file.split(",") if n.strip()]
    trees = []
    missing = []
    for name in names:
        t = manager.restore(template, name)
        if t is None:
            missing.append(name)
            logger.warning("ensemble member %s not found%s", name,
                           "" if strict else " — skipped")
            continue
        trees.append(t)
    if missing and strict and len(names) > 1:
        raise FileNotFoundError(
            f"ensemble member(s) not found: {', '.join(missing)} "
            f"(requested: {restore_file}; pass strict=False / checkpoint.strict_ensemble=false "
            f"to decode with the remaining members)"
        )
    if not trees:
        return None
    if mode == "average" and len(trees) > 1:
        return [average_checkpoints(trees)]
    return trees


def filter_frozen(params: Any, frozen_patterns: List[str]) -> Any:
    """Drop frozen subtrees from an export (reference: src/model.py:268-271
    strips requires_grad=False keys from saved state dicts)."""
    regexes = [re.compile(p) for p in frozen_patterns]

    def keep(path, leaf):
        p = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        return None if any(rx.search(p) for rx in regexes) else leaf

    pruned = jax.tree_util.tree_map_with_path(keep, params)

    def prune_nones(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                pv = prune_nones(v)
                if pv is None or (isinstance(pv, dict) and not pv):
                    continue
                out[k] = pv
            return out
        return tree

    return prune_nones(pruned)
