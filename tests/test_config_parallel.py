import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimodalvc_tpu import config as cfglib
from multimodalvc_tpu.config.configs import TrainRootConfig
from multimodalvc_tpu.parallel import (
    infer_param_specs,
    local_batch_multiple,
    make_mesh,
    resolve_axis_sizes,
    shard_params,
)


def test_registry_roundtrip():
    @dataclasses.dataclass
    class DummyCfg:
        width: int = 4

    @cfglib.register("model", "unit_test_dummy", config=DummyCfg)
    class Dummy:
        def __init__(self, cfg):
            self.cfg = cfg

    obj = cfglib.build("model", "unit_test_dummy", {"width": 7})
    assert obj.cfg.width == 7
    assert "unit_test_dummy" in cfglib.available("model")
    with pytest.raises(KeyError):
        cfglib.build("model", "does_not_exist")


def test_structured_overrides_and_coercion():
    tree = {"optimization": {"lr": 1e-4}}
    cfglib.apply_overrides(
        tree,
        ["optimization.lr=0.001", "optimization.adam_betas=[0.9,0.95]", "common.seed=7"],
    )
    cfg = cfglib.from_dict(TrainRootConfig, tree)
    assert cfg.optimization.lr == 0.001
    assert cfg.optimization.adam_betas == (0.9, 0.95)
    assert cfg.common.seed == 7


def test_from_dict_rejects_unknown_keys():
    with pytest.raises(KeyError):
        cfglib.from_dict(TrainRootConfig, {"nope": 1})


def test_mesh_axis_resolution():
    sizes = resolve_axis_sizes({"data": -1, "tensor": 2}, n_devices=8)
    assert sizes["data"] == 4 and sizes["tensor"] == 2
    with pytest.raises(ValueError):
        resolve_axis_sizes({"data": 3}, n_devices=8)


def test_mesh_and_param_sharding():
    assert jax.device_count() == 8
    mesh = make_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    assert local_batch_multiple(mesh) == 4
    params = {
        "layer0": {"q_proj": {"kernel": jnp.zeros((256, 512))}},
        "layer1": {"o_proj": {"kernel": jnp.zeros((512, 256))}},
        "norm": {"scale": jnp.ones((256,))},
        "big_embed": {"table": jnp.zeros((4096, 64))},
    }
    specs = infer_param_specs(params, mesh)
    assert specs["layer0"]["q_proj"]["kernel"] == P("fsdp", "tensor")
    assert specs["layer1"]["o_proj"]["kernel"] == P("tensor", "fsdp")
    assert specs["norm"]["scale"] == P()
    # fallback: largest dim over fsdp
    assert specs["big_embed"]["table"] == P("fsdp", None)

    sharded, _ = shard_params(params, mesh)
    k = sharded["layer0"]["q_proj"]["kernel"]
    assert k.sharding.spec == P("fsdp", "tensor")


def test_sharded_matmul_runs_on_mesh():
    mesh = make_mesh({"data": 2, "tensor": 4})
    x = jnp.ones((8, 128))
    w = jnp.ones((128, 256))
    from jax.sharding import NamedSharding

    x = jax.device_put(x, NamedSharding(mesh, P(("data",), None)))
    w = jax.device_put(w, NamedSharding(mesh, P(None, "tensor")))

    @jax.jit
    def f(x, w):
        return x @ w

    out = f(x, w)
    np.testing.assert_allclose(np.asarray(out), np.full((8, 256), 128.0))
