"""On-TPU compiled-kernel tier: every Pallas kernel vs its oracle, for real.

Run with::

    MMVC_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_kernels.py -v

Without MMVC_TPU_TESTS the conftest forces the 8-device CPU mesh and these
tests auto-skip.  The checks themselves live in
multimodalvc_tpu/ops/selftest.py so ``bench.py --selftest`` runs the exact
same set before any bench number is trusted.

Why this tier exists: interpret-mode tests emulate Pallas with jnp ops and
provably let Mosaic compile failures ship (commit 9d17ce8 fixed three
classes post-hoc).  Reference analog: fairseq/tests/gpu/test_binaries_gpu.py
(hardware-gated tier, skipped without CUDA).
"""
import os

import pytest

pytestmark = pytest.mark.tpu

if os.environ.get("MMVC_TPU_TESTS"):
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip(
            "MMVC_TPU_TESTS set but no TPU backend available", allow_module_level=True
        )

from multimodalvc_tpu.ops.selftest import CHECKS  # noqa: E402


@pytest.mark.parametrize("name", sorted(CHECKS))
def test_compiled_kernel_matches_oracle(name):
    result = CHECKS[name]()
    assert result["ok"], result
