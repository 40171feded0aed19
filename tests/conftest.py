"""Test harness: force an 8-device virtual CPU mesh before any backend init.

Mirrors the reference's single-host multi-process distributed tests
(reference: fairseq/tests/distributed/utils.py spawn_and_init) with JAX's
virtual-device mechanism: every test can build a real 8-way Mesh and jit
sharded programs without TPU hardware.

Note: the environment may pre-import jax with a TPU platform selected (axon
sitecustomize), so env vars are too late — use jax.config directly.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
