"""Multi-host bootstrap: rendezvous inference + a real 2-process spawn test.

Mirrors the reference's spawn-and-init distributed tests
(fairseq/tests/distributed/utils.py:12-31) with jax.distributed over two
local CPU processes (gloo cross-process collectives).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from multimodalvc_tpu.parallel.distributed import infer_init_args

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(**extra):
    env = {k: v for k, v in os.environ.items() if k not in (
        "COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
        "MASTER_ADDR", "MASTER_PORT", "WORLD_SIZE", "RANK",
        "SLURM_JOB_ID", "SLURM_NTASKS", "TPU_WORKER_HOSTNAMES",
        "MEGASCALE_COORDINATOR_ADDRESS",
    )}
    env.update(extra)
    return env


def test_infer_init_args_env_priority(monkeypatch):
    for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
              "MASTER_ADDR", "MASTER_PORT", "WORLD_SIZE", "RANK",
              "SLURM_JOB_ID", "SLURM_NTASKS", "TPU_WORKER_HOSTNAMES",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    # nothing set -> single process, no init
    assert infer_init_args() is None

    # torch.distributed.launch-style env (reference env:// path)
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("MASTER_PORT", "29500")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "3")
    kw = infer_init_args()
    assert kw == {
        "coordinator_address": "10.0.0.1:29500",
        "num_processes": 4,
        "process_id": 3,
    }
    # WORLD_SIZE=1 -> not distributed
    monkeypatch.setenv("WORLD_SIZE", "1")
    assert infer_init_args() is None

    # explicit JAX-style env wins over everything
    monkeypatch.setenv("COORDINATOR_ADDRESS", "host:1234")
    monkeypatch.setenv("NUM_PROCESSES", "2")
    monkeypatch.setenv("PROCESS_ID", "1")
    kw = infer_init_args()
    assert kw == {
        "coordinator_address": "host:1234", "num_processes": 2, "process_id": 1,
    }


def test_infer_init_args_slurm(monkeypatch):
    for k in ("COORDINATOR_ADDRESS", "MASTER_ADDR", "MASTER_PORT",
              "WORLD_SIZE", "RANK", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("SLURM_JOB_ID", "1234")
    monkeypatch.setenv("SLURM_NTASKS", "4")
    # SLURM -> no-arg auto-detect (JAX's SlurmCluster reads SLURM_* itself)
    assert infer_init_args() == {}
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert infer_init_args() is None


def test_hybrid_device_array_layout():
    """DCN granule factor lands on the data axis; model axes stay inside a
    granule (single-process: every device is granule 0, plain layout)."""
    import jax

    from multimodalvc_tpu.parallel.distributed import hybrid_device_array
    from multimodalvc_tpu.parallel.mesh import AXIS_ORDER

    sizes = {ax: 1 for ax in AXIS_ORDER}
    sizes["data"], sizes["tensor"] = 4, 2
    arr = hybrid_device_array(sizes, AXIS_ORDER, jax.devices())
    assert arr.shape == tuple(sizes[ax] for ax in AXIS_ORDER)
    assert sorted(d.id for d in arr.flatten()) == list(range(8))


def test_two_process_train_step_matches_single_process():
    """Spawn 2 local processes (reference: spawn-and-init tests), each with 4
    CPU devices; run sharded train steps over the joint 8-device mesh and
    assert (a) both ranks report identical losses, (b) the losses match a
    single-process run of the same global computation, (c) shard_batches gave
    each rank a disjoint covering slice."""
    port = 23000 + os.getpid() % 2000
    procs = []
    for rank in range(2):
        env = _clean_env(
            MASTER_ADDR="localhost",
            MASTER_PORT=str(port),
            WORLD_SIZE="2",
            RANK=str(rank),
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "distributed_worker.py")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
            text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    r0, r1 = sorted(outs, key=lambda o: o["rank"])
    assert r0["is_master"] and not r1["is_master"]
    assert r0["n_procs"] == r1["n_procs"] == 2
    # disjoint covering slices of the 4-batch corpus
    assert sorted(r0["idx"] + r1["idx"]) == [0, 1, 2, 3]
    # the train step is a GLOBAL computation: every rank sees the same loss
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)

    # ground truth: same mesh shape, single process, batches joined in
    # process order (process 0's shard first on the data axis)
    import jax
    import jax.numpy as jnp

    from multimodalvc_tpu.config.configs import OptimizationConfig
    from multimodalvc_tpu.parallel.mesh import make_mesh
    from multimodalvc_tpu.runtime.trainer import Trainer

    mesh = make_mesh({"data": -1, "tensor": 2})
    k = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(k, (16, 16)) * 0.1, "b": jnp.zeros((16,))}

    def loss_fn(p, colls, batch, rng):
        pred = batch["x"] @ p["w"] + p["b"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, ({"loss": loss}, colls)

    trainer = Trainer(
        loss_fn, params, {},
        OptimizationConfig(lr=1e-2, warmup_updates=0, max_update=10),
        mesh=mesh,
    )
    rng_np = np.random.default_rng(0)
    corpus = [
        {
            "x": rng_np.standard_normal((8, 16)).astype(np.float32),
            "y": rng_np.standard_normal((8, 16)).astype(np.float32),
        }
        for _ in range(4)
    ]
    expected = []
    for i0, i1 in zip(r0["idx"], r1["idx"]):
        joint = {
            kk: np.concatenate([corpus[i0][kk], corpus[i1][kk]], axis=0)
            for kk in ("x", "y")
        }
        expected.append(float(trainer.train_step(joint)["loss"]))
    np.testing.assert_allclose(r0["losses"], expected, rtol=1e-5)
