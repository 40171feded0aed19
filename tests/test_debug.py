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


def test_oom_batch_split_halves_and_aggregates():
    """OOM-valid-step recovery: halve the batch until it fits (reference:
    fairseq trainer.py:955+)."""
    import numpy as np

    from multimodalvc_tpu.runtime.debug import with_oom_batch_split

    calls = []

    def fake_step(batch):
        b = batch["x"].shape[0]
        calls.append(b)
        if b > 2:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory on device")
        return {"loss": float(batch["x"].sum())}

    batch = {"x": np.arange(8.0), "scalar": np.float32(3.0)}
    out = with_oom_batch_split(fake_step, batch)
    assert [m["loss"] for m in out] == [0 + 1, 2 + 3, 4 + 5, 6 + 7]
    assert calls == [8, 4, 2, 2, 4, 2, 2]


def test_oom_batch_split_reraises_non_oom_and_exhausted():
    import numpy as np
    import pytest

    from multimodalvc_tpu.runtime.debug import with_oom_batch_split

    def bad(batch):
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        with_oom_batch_split(bad, {"x": np.arange(4.0)})

    def always_oom(batch):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    with pytest.raises(RuntimeError):
        with_oom_batch_split(always_oom, {"x": np.arange(4.0)})


def test_oom_batch_split_repads_to_multiple_and_uses_batch_key():
    """ADVICE r2 medium: retried halves must keep the mesh batch-divisibility
    invariant, and the batch axis must come from the right array (not the
    first dict value, which may not be batch-leading)."""
    import numpy as np
    from multimodalvc_tpu.runtime.debug import with_oom_batch_split

    calls = []

    def fake_step(batch):
        b = batch["tokens"].shape[0]
        calls.append(b)
        if b > 4:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return b

    batch = {
        # a non-batch-leading array listed FIRST (dim 0 = 17 != batch)
        "lut": np.zeros((17, 3)),
        "tokens": np.arange(6 * 2).reshape(6, 2),
    }
    out = with_oom_batch_split(fake_step, batch, pad_multiple=4, batch_key="tokens")
    # 6 OOMs -> halves of 3 re-padded to 4; every retried call is a multiple of 4
    assert out == [4, 4]
    assert all(c % 4 == 0 or c == 6 for c in calls)


def test_oom_batch_split_stops_at_pad_multiple():
    import numpy as np
    import pytest
    from multimodalvc_tpu.runtime.debug import with_oom_batch_split

    def always_oom(batch):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    # rows == pad_multiple: splitting further can't help (halves re-pad back
    # to the same size) -> re-raise instead of looping
    with pytest.raises(RuntimeError):
        with_oom_batch_split(always_oom, {"x": np.zeros((4, 2))}, pad_multiple=4)
