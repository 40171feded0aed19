"""Worker process for the 2-process distributed bootstrap test.

Spawned by test_distributed.py with torch-launch-style env vars
(MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK) so distributed_init exercises the
same rendezvous inference the reference's env:// path used
(fairseq/distributed/utils.py:77-83).  Runs a short sharded training loop on
a 2-process x 4-CPU-device global mesh and prints one JSON result line.
"""
import json
import os
import sys

# spawned as `python tests/distributed_worker.py`: sys.path[0] is tests/, so
# the repo root (the package's parent) must be added explicitly
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
# share the suite's persistent compile cache (conftest.py) — the spawned
# workers otherwise recompile the sharded train step on every suite run
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from multimodalvc_tpu.parallel.distributed import (  # noqa: E402
    distributed_init,
    global_batch_from_local,
    is_master,
)

n_procs = distributed_init()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from multimodalvc_tpu.config.configs import OptimizationConfig  # noqa: E402
from multimodalvc_tpu.data.batching import shard_batches  # noqa: E402
from multimodalvc_tpu.parallel.mesh import local_batch_multiple, make_mesh  # noqa: E402
from multimodalvc_tpu.runtime.trainer import Trainer  # noqa: E402


def loss_fn(p, colls, batch, rng):
    pred = batch["x"] @ p["w"] + p["b"]
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, ({"loss": loss}, colls)


def main():
    assert n_procs == 2, f"expected 2 processes, got {n_procs}"
    assert jax.device_count() == 8, jax.device_count()

    mesh = make_mesh({"data": -1, "tensor": 2})  # global: data=4, tensor=2
    mult = local_batch_multiple(mesh)  # 4 // 2 processes = 2 rows

    k = jax.random.PRNGKey(0)
    params = {
        "w": jax.random.normal(k, (16, 16)) * 0.1,
        "b": jnp.zeros((16,)),
    }
    trainer = Trainer(
        loss_fn, params, {},
        OptimizationConfig(lr=1e-2, warmup_updates=0, max_update=10),
        mesh=mesh,
    )

    # deterministic global corpus; each process owns its shard_batches slice
    rng_np = np.random.default_rng(0)
    corpus = [
        {
            "x": rng_np.standard_normal((8, 16)).astype(np.float32),
            "y": rng_np.standard_normal((8, 16)).astype(np.float32),
        }
        for _ in range(4)
    ]
    idx = shard_batches(
        list(range(len(corpus))), jax.process_count(), jax.process_index()
    )
    losses = []
    for i in idx:
        local = corpus[int(i)]
        assert local["x"].shape[0] % mult == 0
        gbatch = global_batch_from_local(local, mesh)
        m = trainer.train_step(gbatch)
        losses.append(float(m["loss"]))

    print(json.dumps({
        "rank": jax.process_index(),
        "n_procs": n_procs,
        "is_master": is_master(),
        "idx": [int(i) for i in idx],
        "losses": losses,
        "mesh_shape": dict(mesh.shape),
        "local_multiple": mult,
    }))


if __name__ == "__main__":
    sys.exit(main())
