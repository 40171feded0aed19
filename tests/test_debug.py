"""Failure-detection utilities: NaN localisation, checkify, watchdog."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalvc_tpu.runtime.debug import (
    NanDetector,
    Watchdog,
    check_cross_process_scalar,
    checkify_loss,
    find_nonfinite,
)


def test_find_nonfinite_paths():
    tree = {
        "ok": jnp.ones(3),
        "sub": {"bad": jnp.asarray([1.0, np.nan, np.inf]), "ints": jnp.arange(3)},
    }
    bad = find_nonfinite(tree)
    assert len(bad) == 1 and bad[0].startswith("sub/bad") and "2/3" in bad[0]


def test_nan_detector_localises_grad_nan():
    def loss_fn(params, batch):
        # sqrt at 0 -> NaN grad in exactly one subtree
        return jnp.sum(jnp.sqrt(params["a"])) + jnp.sum(params["b"] * batch), None

    params = {"a": jnp.zeros(2), "b": jnp.ones(2)}
    report = NanDetector(loss_fn).run(params, jnp.ones(2))
    assert not report["loss_nonfinite"]
    assert any(p.startswith("grads/a") for p in report["nonfinite_grads"])
    assert not any(p.startswith("grads/b") for p in report["nonfinite_grads"])
    assert report["nonfinite_params"] == []


def test_checkify_loss_raises_on_nan():
    def loss_fn(x):
        return jnp.log(x).sum()

    wrapped = checkify_loss(loss_fn)
    assert np.isfinite(float(wrapped(jnp.ones(3))))
    with pytest.raises(Exception):
        wrapped(jnp.zeros(3) - 1.0)  # log of negative -> NaN


def test_watchdog_fires_and_cancels():
    fired = []
    with Watchdog(0.05, on_timeout=lambda: fired.append(1)):
        time.sleep(0.15)
    assert fired
    fired.clear()
    with Watchdog(5.0, on_timeout=lambda: fired.append(1)):
        pass
    time.sleep(0.05)
    assert not fired


def test_cross_process_scalar_single_process():
    assert check_cross_process_scalar("gnorm", 1.234)
