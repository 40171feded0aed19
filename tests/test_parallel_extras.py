"""Expert routing + pipeline parallelism on the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalvc_tpu.parallel import make_mesh
from multimodalvc_tpu.parallel.expert import BaseMoELayer, sinkhorn_route
from multimodalvc_tpu.parallel.pipeline import microbatch, pipeline_apply, unmicrobatch


def test_sinkhorn_route_is_balanced(rng):
    scores = jnp.asarray(rng.standard_normal((64, 4)).astype(np.float32))
    plan = sinkhorn_route(scores, n_iters=20)
    np.testing.assert_allclose(np.asarray(plan.sum(axis=1)), np.ones(64), atol=1e-3)
    np.testing.assert_allclose(np.asarray(plan.sum(axis=0)), np.full(4, 16.0), atol=0.05)
    # hard assignment is near-balanced
    counts = np.bincount(np.asarray(plan.argmax(axis=1)), minlength=4)
    assert counts.max() - counts.min() <= 8


@pytest.mark.slow
def test_moe_layer_forward_and_expert_sharding(rng):
    mesh = make_mesh({"expert": 4, "data": 2})
    layer = BaseMoELayer(num_experts=4, ffn_dim=32)
    x = jnp.asarray(rng.standard_normal((2, 16, 16)).astype(np.float32))
    vs = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(vs, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # gradient flows to expert weights
    def loss(p):
        return jnp.sum(layer.apply({"params": p}, x) ** 2)
    g = jax.grad(loss)(vs["params"])
    assert float(jnp.abs(g["experts_w1"]).sum()) > 0

    # runs under jit on the mesh with expert weights sharded
    from multimodalvc_tpu.parallel import shard_params

    sharded, specs = shard_params(vs["params"], mesh)
    out2 = jax.jit(lambda p, x: layer.apply({"params": p}, x))(sharded, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=1e-4, atol=1e-5)


def test_pipeline_matches_sequential(rng):
    mesh = make_mesh({"pipeline": 4, "data": 2})
    d = 16
    n_stages = 4
    w = rng.standard_normal((n_stages, d, d)).astype(np.float32) * 0.3
    b = rng.standard_normal((n_stages, d)).astype(np.float32) * 0.1
    params = {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    def stage_fn(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    x = rng.standard_normal((8, 4, d)).astype(np.float32)  # [B=8*4? no: M=8, mb=4]
    xs = jnp.asarray(x)
    out = pipeline_apply(stage_fn, params, xs, mesh)

    ref = xs
    for s in range(n_stages):
        ref = jnp.tanh(ref @ params["w"][s] + params["b"][s])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_microbatch_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((12, 3)).astype(np.float32))
    mb = microbatch(x, 4)
    assert mb.shape == (4, 3, 3)
    np.testing.assert_array_equal(np.asarray(unmicrobatch(mb)), np.asarray(x))


@pytest.mark.slow
def test_moe_conformer_product_path(rng):
    """EP wired into the product Conformer (conf/mms-speech-nollm-moe.yaml):
    the MoE FFN variant trains a step on an {expert:4, data:2} mesh with the
    expert banks sharded over the expert axis."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodalvc_tpu.nn.conformer import ConformerConfig, ConformerEncoder
    from multimodalvc_tpu.parallel.mesh import make_mesh
    from multimodalvc_tpu.parallel.sharding import shard_params

    cfg = ConformerConfig.sized("S", moe_experts=4)
    enc = ConformerEncoder(cfg)
    x = jnp.asarray(rng.standard_normal((4, 16, cfg.attention_dim)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    assert "ff_moe" in variables["params"]["blocks_0"], "MoE FFN replaces dense ff"

    mesh = make_mesh({"expert": 4, "data": 2})
    params, specs = shard_params(variables["params"], mesh)
    assert specs["blocks_0"]["ff_moe"]["experts_w1"] == P("expert")
    assert specs["blocks_0"]["ff_moe"]["expert_centroids"] == P()

    xb = jax.device_put(x, NamedSharding(mesh, P("data")))
    batch_stats = variables["batch_stats"]

    def loss_fn(p, xin):
        out = enc.apply({"params": p, "batch_stats": batch_stats}, xin)
        return jnp.mean(out**2)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, xb)
    assert np.isfinite(float(loss))
    g = grads["blocks_0"]["ff_moe"]["experts_w1"]
    assert float(jnp.abs(g).sum()) > 0, "gradient reaches the expert bank"
    new_params = jax.tree.map(lambda p, gg: p - 1e-3 * gg, params, grads)
    loss2 = jax.jit(loss_fn)(new_params, xb)
    assert float(loss2) < float(loss)


def test_moe_preset_parses():
    """The shipped MoE preset maps onto the config tree."""
    import os

    from multimodalvc_tpu.config import TrainRootConfig, from_dict, load_yaml

    preset = os.path.join(os.path.dirname(__file__), "..", "conf", "mms-speech-nollm-moe.yaml")
    tree = load_yaml(preset)
    tree["dataset"]["data"] = "/tmp/x"
    cfg = from_dict(TrainRootConfig, tree)
    assert cfg.mesh.expert == 4
    assert cfg.model["conformer_moe_experts"] == 4


@pytest.mark.slow
def test_llama_pipeline_forward_matches_sequential(rng):
    """PP wired into the product LLaMA: pipelined logits == the sequential
    forward, composed with data parallelism, grads reaching every stage."""
    from multimodalvc_tpu.nn.llama import LlamaConfig, LlamaModel, pipeline_lm_forward
    from multimodalvc_tpu.parallel.mesh import make_mesh

    cfg = LlamaConfig.tiny()
    cfg.lora = None
    model = LlamaModel(cfg)
    b, t = 4, 10
    emb = jnp.asarray(
        (rng.standard_normal((b, t, cfg.hidden_size)) * 0.05).astype(np.float32)
    )
    mask = np.ones((b, t), np.int32)
    mask[1, :4] = 0  # left padding
    mask = jnp.asarray(mask)
    variables = model.init(jax.random.PRNGKey(0), inputs_embeds=emb, attn_mask=mask)
    ref = model.apply(variables, inputs_embeds=emb, attn_mask=mask)["logits"]

    mesh = make_mesh({"pipeline": 2, "data": 2}, devices=jax.devices()[:4])
    got = jax.jit(
        lambda v, e, m: pipeline_lm_forward(cfg, v, e, m, mesh, n_microbatches=2)
    )(variables, emb, mask)
    # pad rows differ (fully-masked attention) — compare valid rows
    vr = np.asarray(mask)[..., None].astype(bool)
    np.testing.assert_allclose(
        np.asarray(got) * vr, np.asarray(ref) * vr, rtol=2e-4, atol=2e-4
    )

    def loss(v):
        lg = pipeline_lm_forward(cfg, v, emb, mask, mesh, 2)
        return jnp.mean(lg**2)

    g = jax.jit(jax.grad(loss))(variables)
    for i in range(cfg.num_layers):
        gs = sum(
            float(jnp.abs(x).sum())
            for x in jax.tree.leaves(g["params"][f"layers_{i}"])
        )
        assert gs > 0, f"no grad reached stage layer {i}"


@pytest.mark.slow
def test_avsr_pipeline_loss_product_path(rng):
    """conf/mms-llama-pp.yaml wiring: the AVSR loss with the LLaMA trunk
    pipelined over {pipeline:2, data:2} matches the sequential loss."""
    from multimodalvc_tpu.models.avsr import AVSRConfig, AVSRSystem
    from multimodalvc_tpu.parallel.mesh import make_mesh

    from tests.test_avsr_model import make_batch

    cfg = AVSRConfig.tiny()
    system = AVSRSystem(cfg)
    batch = make_batch(rng, cfg, b=4)
    variables = system.init(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    colls = {k: v for k, v in variables.items() if k != "params"}
    rng_key = jax.random.PRNGKey(1)

    ref_loss, _ = system.make_trainer_loss_fn()(params, colls, batch, rng_key)

    mesh = make_mesh({"pipeline": 2, "data": 2}, devices=jax.devices()[:4])
    pipe_fn = system.make_pipeline_loss_fn(mesh, n_microbatches=2)
    loss, (metrics, _) = jax.jit(pipe_fn)(params, colls, batch, rng_key)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)

    # grads flow through encoder AND every llama layer
    g, _ = jax.jit(jax.grad(pipe_fn, has_aux=True))(params, colls, batch, rng_key)
    for i in range(cfg.llama.num_layers):
        gs = sum(
            float(jnp.abs(x).sum())
            for x in jax.tree.leaves(g["llama"][f"layers_{i}"])
        )
        assert gs > 0, f"no grad at llama layer {i}"
    enc_g = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["encoder"]))
    assert enc_g > 0


@pytest.mark.slow
def test_pipeline_lora_dropout_threads_rng(rng):
    """PP LoRA dropout (VERDICT r2 weak #7): with nonzero lora_b the
    pipelined forward is rng-dependent when dropout is on (reference trains
    with LoRA dropout 0.05, src/model.py:244-252), deterministic per-key,
    and dropout-off still matches the sequential forward."""
    import dataclasses

    from multimodalvc_tpu.nn.llama import (
        LlamaConfig, LlamaModel, LoraConfig, pipeline_lm_forward,
    )
    from multimodalvc_tpu.parallel.mesh import make_mesh

    cfg = LlamaConfig.tiny()
    cfg.lora = LoraConfig(rank=4, alpha=8, dropout=0.5)
    model = LlamaModel(cfg)
    b, t = 4, 10
    emb = jnp.asarray(
        (rng.standard_normal((b, t, cfg.hidden_size)) * 0.05).astype(np.float32)
    )
    mask = jnp.ones((b, t), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), inputs_embeds=emb, attn_mask=mask)

    # lora_b inits to zero -> dropout is invisible; make it nonzero
    def bump(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if "lora_b" in "/".join(str(getattr(k, "key", k)) for k in path):
            return jnp.ones_like(leaf) * 0.1
        return leaf

    variables = jax.tree_util.tree_map_with_path(bump, variables)

    mesh = make_mesh({"pipeline": 2, "data": 2}, devices=jax.devices()[:4])
    run = jax.jit(
        lambda v, e, m, key: pipeline_lm_forward(
            cfg, v, e, m, mesh, n_microbatches=2, dropout_rng=key
        )
    )
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    o1a = np.asarray(run(variables, emb, mask, k1))
    o1b = np.asarray(run(variables, emb, mask, k1))
    o2 = np.asarray(run(variables, emb, mask, k2))
    np.testing.assert_array_equal(o1a, o1b)  # same key -> same mask
    assert np.abs(o1a - o2).max() > 1e-6  # different key -> different mask

    # dropout off (dropout_rng=None) == sequential deterministic forward
    det = jax.jit(
        lambda v, e, m: pipeline_lm_forward(cfg, v, e, m, mesh, n_microbatches=2)
    )(variables, emb, mask)
    ref = model.apply(
        variables, inputs_embeds=emb, attn_mask=mask, deterministic=True
    )["logits"]
    np.testing.assert_allclose(np.asarray(det), np.asarray(ref), rtol=2e-4, atol=2e-4)
