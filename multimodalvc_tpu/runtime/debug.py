"""Debugging / failure-detection utilities.

TPU-native analogs of the reference's debugging subsystem:
 * NanDetector fw/bw hooks re-running the failed batch
   (fairseq/fairseq/nan_detector.py:1-108, invoked trainer.py:835-850)
   -> ``find_nonfinite`` over grads/params + ``checkify_loss`` which
   compiles NaN checks into the step itself;
 * cross-worker grad-norm consistency check (trainer.py:1300-1337)
   -> ``check_cross_process_scalar`` comparing a scalar across JAX
   processes (in single-program GSPMD, per-device grads are consistent by
   construction, so the check only matters across processes);
 * DistributedTimeoutWrapper heartbeat killing ranks hung in forward
   (fairseq/fairseq/distributed/distributed_timeout_wrapper.py:1-94)
   -> ``Watchdog`` context manager around blocking device work.
"""
from __future__ import annotations

import logging
import os
import signal
import threading
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def find_nonfinite(tree: Any, prefix: str = "") -> List[str]:
    """Paths of leaves containing NaN/Inf (host-side, blocks on values)."""
    bad: List[str] = []
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            path = prefix + "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{path} ({n_bad}/{arr.size} non-finite)")
    return bad


class NanDetector:
    """Re-run a failed batch and localise the first non-finite tensor.

    Usage mirrors the reference's flow (trainer.py:835-850): when a step
    produces a non-finite loss/grad, call ``detector.run(params, batch)``
    to re-execute the loss with per-module output checks enabled.
    """

    def __init__(self, loss_fn: Callable):
        self.loss_fn = loss_fn

    def run(self, *args) -> Dict[str, Any]:
        loss, aux = self.loss_fn(*args)
        report: Dict[str, Any] = {"loss_nonfinite": not bool(np.isfinite(float(loss)))}
        grads = jax.grad(lambda *a: self.loss_fn(*a)[0])(*args)
        report["nonfinite_grads"] = find_nonfinite(grads, "grads/")
        report["nonfinite_params"] = find_nonfinite(args[0], "params/")
        for line in report["nonfinite_grads"] + report["nonfinite_params"]:
            logger.error("NanDetector: %s", line)
        return report


def checkify_loss(loss_fn: Callable):
    """Wrap a loss so NaN/Inf production raises inside jit (checkify float
    checks — the compile-time version of the reference's module hooks)."""
    from jax.experimental import checkify

    checked = checkify.checkify(loss_fn, errors=checkify.float_checks)

    def wrapped(*args):
        err, out = checked(*args)
        checkify.check_error(err)
        return out

    return wrapped


def check_cross_process_scalar(name: str, value: float, atol: float = 1e-4) -> bool:
    """Assert a host scalar (e.g. grad norm) agrees across JAX processes.

    Single-process: trivially True.  Multi-process: all-gathers the scalar
    over processes and compares (reference: trainer.py:1300-1337 raising on
    rank grad-norm divergence, which caught desync bugs in legacy DDP).
    """
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    gathered = np.asarray(
        multihost_utils.process_allgather(jnp.asarray([value], jnp.float32))
    ).reshape(-1)
    ok = bool(np.all(np.abs(gathered - gathered[0]) <= atol * (1 + np.abs(gathered[0]))))
    if not ok:
        logger.error(
            "cross-process %s divergence: %s — possible desync "
            "(different data or non-deterministic op order)",
            name,
            gathered.tolist(),
        )
    return ok


class Watchdog:
    """Kill/log when a step hangs (DistributedTimeoutWrapper analog).

    Context manager around blocking device work; if the body does not
    finish within ``timeout_s``, ``on_timeout`` fires from a daemon thread
    (default: log + SIGINT the process like the reference's heartbeat).
    """

    def __init__(
        self,
        timeout_s: float,
        on_timeout: Optional[Callable[[], None]] = None,
        kill: bool = False,
    ):
        self.timeout_s = timeout_s
        self.kill = kill
        self.on_timeout = on_timeout or self._default_timeout
        self._timer: Optional[threading.Timer] = None
        self.fired = False

    def _default_timeout(self):
        self.fired = True
        logger.error(
            "watchdog: step exceeded %.1f s — device hang or pathological "
            "recompile; %s",
            self.timeout_s,
            "sending SIGINT" if self.kill else "continuing (kill=False)",
        )
        if self.kill:
            os.kill(os.getpid(), signal.SIGINT)

    def __enter__(self):
        self.fired = False
        self._timer = threading.Timer(self.timeout_s, self.on_timeout)
        self._timer.daemon = True
        self._timer.start()
        return self

    def __exit__(self, *exc):
        if self._timer is not None:
            self._timer.cancel()
        return False


def _batch_rows(batch, batch_key: Optional[str] = None) -> int:
    """Batch size = dim 0 of the designated key, else the max dim 0 over all
    array values (the rule pad_batch_to_multiple pads by — the first array's
    dim 0 is not guaranteed batch-leading)."""
    if batch_key is not None and hasattr(batch.get(batch_key), "ndim"):
        return int(batch[batch_key].shape[0])
    sizes = [int(v.shape[0]) for v in batch.values()
             if hasattr(v, "ndim") and v.ndim >= 1]
    return max(sizes) if sizes else 0


def _slice_batch(batch, lo: int, hi: int, batch_key: Optional[str] = None):
    b = _batch_rows(batch, batch_key)
    return {
        k: (v[lo:hi] if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == b else v)
        for k, v in batch.items()
    }


def is_oom_error(e: BaseException) -> bool:
    s = str(e)
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s or "out of memory" in s


def with_oom_batch_split(fn, batch, max_splits: int = 3, pad_multiple: int = 1,
                         batch_key: Optional[str] = None) -> list:
    """Run ``fn(batch)``; on device OOM, halve the batch and retry each half
    (reference: fairseq trainer.py:955+ valid_step ran OOM batches again at
    half size).  Returns a LIST of per-chunk results so callers aggregate
    with their usual weighting.  Non-OOM errors propagate; a single-row OOM
    or exhausted split budget re-raises.

    ``pad_multiple``: mesh batch-divisibility requirement (data*fsdp axis
    size) — each retried half is re-padded to this multiple so sharded steps
    keep their invariant AND halves of equal-size batches share one compiled
    program instead of forcing fresh compiles right after an OOM.
    ``batch_key``: name of the array whose dim 0 defines the batch size
    (defaults to the max dim 0 over all arrays, pad_batch_to_multiple's rule).
    """
    def _repad(b_):
        # repeat-last-row padding keyed on the SAME batch axis as the slice
        # (pad_batch_to_multiple keys on max dim 0, which may be a non-batch
        # array here)
        rows_ = _batch_rows(b_, batch_key)
        target = -(-rows_ // max(1, pad_multiple)) * max(1, pad_multiple)
        if target == rows_:
            return b_
        reps = np.concatenate([np.arange(rows_), np.full(target - rows_, rows_ - 1)])
        return {
            k: (v[reps] if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == rows_
                else v)
            for k, v in b_.items()
        }

    try:
        return [fn(batch)]
    except Exception as e:  # jaxlib XlaRuntimeError and friends
        if not is_oom_error(e):
            raise
        rows = _batch_rows(batch, batch_key)
        if rows <= max(1, pad_multiple) or max_splits <= 0:
            raise
        logger.warning(
            "device OOM on a %d-row batch — retrying as two halves (%d splits left)",
            rows, max_splits - 1,
        )
        half = rows // 2
        lo = _repad(_slice_batch(batch, 0, half, batch_key))
        hi = _repad(_slice_batch(batch, half, rows, batch_key))
        return with_oom_batch_split(fn, lo, max_splits - 1, pad_multiple, batch_key) + \
            with_oom_batch_split(fn, hi, max_splits - 1, pad_multiple, batch_key)
