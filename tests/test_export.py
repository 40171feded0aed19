"""Model export (reference analog: fairseq tests/test_export.py torchscript
round-trips).  TPU-native equivalent: jax.export serialises the jitted AVSR
forward to StableHLO bytes; the deserialised artifact must run and agree."""
import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_export_roundtrip_avsr_forward(rng):
    try:
        from jax import export
    except ImportError:
        pytest.skip("jax.export unavailable")

    import __graft_entry__ as g

    fn, (variables, batch) = g.entry()
    jitted = jax.jit(fn)
    ref_loss, ref_logits = jitted(variables, batch)

    exp = export.export(jitted)(variables, batch)
    blob = exp.serialize()
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    reloaded = export.deserialize(blob)
    loss2, logits2 = reloaded.call(variables, batch)
    np.testing.assert_allclose(float(ref_loss), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(logits2), rtol=1e-4, atol=1e-5
    )
