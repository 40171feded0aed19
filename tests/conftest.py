"""Test harness: force an 8-device virtual CPU mesh before any backend init.

Mirrors the reference's single-host multi-process distributed tests
(reference: fairseq/tests/distributed/utils.py spawn_and_init) with JAX's
virtual-device mechanism: every test can build a real 8-way Mesh and jit
sharded programs without TPU hardware.

Note: the environment may pre-import jax with a TPU platform selected (axon
sitecustomize), so env vars are too late — use jax.config directly.

The ON-HARDWARE tier is the exception: ``MMVC_TPU_TESTS=1 pytest -m tpu``
keeps the real TPU backend so tests/test_tpu_kernels.py can verify every
Pallas kernel COMPILED (interpret=False) against its oracle — interpret-mode
CPU tests cannot catch Mosaic compiler failures (reference analog:
fairseq/tests/gpu/test_binaries_gpu.py, CUDA-gated).
"""
import os

_TPU_TIER = bool(os.environ.get("MMVC_TPU_TESTS"))

if not _TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: repeated suite runs (and repeated identical
# programs within one run — e.g. train-then-resume CLI tests) skip XLA
# compilation, which dominates wall clock for the tiny-model tests.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---- slow-test gating --------------------------------------------------------
# Long-running cases (large compiles, multi-step training loops) are marked
# @pytest.mark.slow and skipped by default so `pytest -q` stays fast; run the
# full pyramid with `pytest --runslow` (or RUN_SLOW=1).


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False, help="run slow tests"
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test (>30 s)")
    config.addinivalue_line(
        "markers", "smoke: fast end-to-end pass that runs even in fast mode"
    )
    config.addinivalue_line(
        "markers",
        "tpu: on-hardware compiled-kernel test (MMVC_TPU_TESTS=1 pytest -m tpu)",
    )


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="tpu tier: run with MMVC_TPU_TESTS=1 pytest -m tpu on a TPU host"
    )
    for item in items:
        if "tpu" in item.keywords and not _TPU_TIER:
            item.add_marker(skip_tpu)
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: run with --runslow or RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords and "smoke" not in item.keywords:
            item.add_marker(skip)
