"""Multi-chip sharded training on a virtual 8-device CPU mesh.

Demonstrates the mesh axes the framework exposes — dp x fsdp x tp for the
AVSR training step, plus sequence-parallel (ring attention), expert-parallel
(BASE-style MoE), and pipeline-parallel (GPipe over the LLaMA trunk) — all
via GSPMD shardings; XLA inserts every collective.  On real hardware the
same code spans actual chips over ICI: just size the axes in the mesh
config (conf/*.yaml expose them).

Reference analogs: fairseq FSDP (distributed/fully_sharded_data_parallel.py),
Megatron-style MP (model_parallel/), torch Pipe PP, BASE layers
(modules/base_layer.py); single-host multi-process testing pattern from
fairseq/tests/distributed/utils.py:12-31.
"""
import jax

# virtual 8-device CPU mesh — must run before first jax use (the env
# pre-imports jax, so plain env vars are too late; see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import __graft_entry__  # noqa: E402  (repo-root driver entry)


if __name__ == "__main__":
    __graft_entry__.dryrun_multichip(8)
    print("all parallel axes exercised on the virtual mesh")
