"""Scalar int8 quantization: small error, real compression, exact small leaves."""
import numpy as np

from multimodalvc_tpu.runtime.quantization import (
    dequantize_tree,
    quantization_error,
    quantize_tree,
)


def test_roundtrip_error_and_ratio(rng):
    tree = {
        "w": rng.standard_normal((256, 64)).astype(np.float32),
        "sub": {"k": (rng.standard_normal((128, 128)) * 5).astype(np.float32)},
        "bias": rng.standard_normal(64).astype(np.float32),  # small: exact
    }
    q = quantize_tree(tree)
    assert "__int8__" in q["w"] and q["w"]["__int8__"].dtype == np.int8
    assert q["bias"].dtype == np.float32  # untouched
    deq = dequantize_tree(q)
    np.testing.assert_array_equal(deq["bias"], tree["bias"])
    # per-channel int8: error bounded by scale/2 = amax/254
    for key, orig, got in [("w", tree["w"], deq["w"]), ("k", tree["sub"]["k"], deq["sub"]["k"])]:
        amax = np.abs(orig).max(axis=0)
        assert np.abs(orig - got).max(axis=0).max() <= (amax / 127.0).max() * 0.51 + 1e-6
    rel, ratio = quantization_error(tree)
    assert rel < 0.01
    assert ratio > 3.0  # ~4x minus scale overhead


def test_dequantize_preserves_structure(rng):
    tree = {"a": [rng.standard_normal((100, 100)).astype(np.float32), np.int32(3)]}
    deq = dequantize_tree(quantize_tree(tree))
    assert isinstance(deq["a"], list) and deq["a"][1] == 3
    assert deq["a"][0].shape == (100, 100)
