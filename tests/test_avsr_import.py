"""Reference-checkpoint key mapping: synthetic torch state dict with the
reference's exact key names -> our AVSR param tree (shape-checked merge)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalvc_tpu.interop.avsr_import import (
    import_reference_avsr,
    import_sr_predictor,
    merge_subtree,
)
from multimodalvc_tpu.models.avsr import AVSRConfig, AVSRSystem

from tests.test_avsr_model import make_batch


def _synthetic_reference_state(params, rng):
    """Build a torch-layout state dict matching our tiny AVSR shapes."""
    st = {}
    enc = params["encoder"]
    k = np.asarray(enc["afeat_1d_conv"]["kernel"])  # [K, I, O]
    st["afeat_1d_conv.weight"] = rng.standard_normal(k.transpose(2, 1, 0).shape).astype(np.float32)
    st["afeat_1d_conv.bias"] = rng.standard_normal(k.shape[2]).astype(np.float32)

    qf = enc["qformer"]
    st["query_tokens"] = rng.standard_normal(np.asarray(qf["query_tokens"]).shape).astype(np.float32)
    st["Qformer.bert.embeddings.LayerNorm.weight"] = rng.standard_normal(
        np.asarray(qf["embeddings_ln"]["scale"]).shape
    ).astype(np.float32)
    st["Qformer.bert.embeddings.LayerNorm.bias"] = np.zeros_like(
        st["Qformer.bert.embeddings.LayerNorm.weight"]
    )

    def put_lin(dst, our):
        kk = np.asarray(our["kernel"])
        st[f"{dst}.weight"] = rng.standard_normal(kk.T.shape).astype(np.float32)
        st[f"{dst}.bias"] = rng.standard_normal(kk.shape[1]).astype(np.float32)

    def put_ln(dst, our):
        st[f"{dst}.weight"] = rng.standard_normal(np.asarray(our["scale"]).shape).astype(np.float32)
        st[f"{dst}.bias"] = np.zeros_like(st[f"{dst}.weight"])

    for i in (0, 1):
        lay = qf[f"layers_{i}"]
        src = f"Qformer.bert.encoder.layer.{i}"
        put_lin(f"{src}.attention.self.query", lay["self_attn"]["q_proj"])
        put_lin(f"{src}.attention.self.key", lay["self_attn"]["k_proj"])
        put_lin(f"{src}.attention.self.value", lay["self_attn"]["v_proj"])
        put_lin(f"{src}.attention.output.dense", lay["self_attn"]["out_proj"])
        put_ln(f"{src}.attention.output.LayerNorm", lay["self_ln"])
        put_lin(f"{src}.crossattention.self.query", lay["cross_attn"]["q_proj"])
        put_lin(f"{src}.crossattention.self.key", lay["cross_attn"]["k_proj"])
        put_lin(f"{src}.crossattention.self.value", lay["cross_attn"]["v_proj"])
        put_lin(f"{src}.crossattention.output.dense", lay["cross_attn"]["out_proj"])
        put_ln(f"{src}.crossattention.output.LayerNorm", lay["cross_ln"])
        put_lin(f"{src}.intermediate_query.dense", lay["intermediate_query"])
        put_lin(f"{src}.output_query.dense", lay["output_query"])
        put_ln(f"{src}.output_query.LayerNorm", lay["ffn_ln"])

    put_lin("avfeat_to_llm.layers.0", enc["avfeat_to_llm"]["layers_0"])
    put_lin("avfeat_to_llm.layers.1", enc["avfeat_to_llm"]["layers_1"])

    # peft LoRA keys
    for li, lay in enumerate(p for p in params["llama"] if p.startswith("layers_")):
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            our = params["llama"][f"layers_{li}"]["self_attn"][proj]
            a = np.asarray(our["lora_a"])
            b = np.asarray(our["lora_b"])
            st[f"llama.model.layers.{li}.self_attn.{proj}.lora_A.default.weight"] = (
                rng.standard_normal(a.T.shape).astype(np.float32)
            )
            st[f"llama.model.layers.{li}.self_attn.{proj}.lora_B.default.weight"] = (
                rng.standard_normal(b.T.shape).astype(np.float32)
            )
    return st


@pytest.mark.slow
def test_reference_avsr_import_merges(rng):
    cfg = AVSRConfig.tiny()
    system = AVSRSystem(cfg)
    batch = make_batch(rng, cfg)
    variables = system.init(jax.random.PRNGKey(0), batch)
    params = jax.tree.map(np.asarray, variables["params"])

    st = _synthetic_reference_state(params, rng)
    updates = import_reference_avsr(st, num_qformer_layers=cfg.qformer_layers)
    n = merge_subtree(params, updates)
    assert n > 40

    # spot-check a mapping: q_proj kernel == torch weight .T
    got = params["encoder"]["qformer"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(got), st["Qformer.bert.encoder.layer.0.attention.self.query.weight"].T
    )
    lora = params["llama"]["layers_0"]["self_attn"]["q_proj"]["lora_a"]
    np.testing.assert_array_equal(
        np.asarray(lora), st["llama.model.layers.0.self_attn.q_proj.lora_A.default.weight"].T
    )

    # the merged tree still runs
    variables = {"params": params, **{k: v for k, v in variables.items() if k != "params"}}
    loss, _ = system.loss_fn(variables, batch)
    assert np.isfinite(float(loss))


def test_merge_rejects_shape_mismatch():
    params = {"a": {"w": np.zeros((2, 2))}}
    with pytest.raises(ValueError):
        merge_subtree(params, {"a": {"w": np.zeros((3, 3))}})


def test_sr_predictor_import(rng):
    from multimodalvc_tpu.nn.modules import SpeechRatePredictor

    sr = SpeechRatePredictor(num_layers=2)
    x = jnp.asarray(rng.standard_normal((1, 10, 1024)).astype(np.float32))
    vs = sr.init(jax.random.PRNGKey(0), x)
    p = jax.tree.map(np.asarray, vs["params"])

    st = {}
    st["sr_predictor.sr_token"] = rng.standard_normal((1, 1, 256)).astype(np.float32)
    def lin(dst, shape_t):
        st[f"sr_predictor.{dst}.weight"] = rng.standard_normal(shape_t).astype(np.float32)
        st[f"sr_predictor.{dst}.bias"] = rng.standard_normal(shape_t[0]).astype(np.float32)
    lin("linear", (256, 1024))
    lin("sr_predictor", (1, 256))
    st["sr_predictor.encoder.pos_conv.0.weight_v"] = rng.standard_normal((256, 16, 128)).astype(np.float32)
    st["sr_predictor.encoder.pos_conv.0.weight_g"] = np.ones((1, 1, 128), np.float32)
    st["sr_predictor.encoder.pos_conv.0.bias"] = np.zeros(256, np.float32)
    st["sr_predictor.encoder.layer_norm.weight"] = np.ones(256, np.float32)
    st["sr_predictor.encoder.layer_norm.bias"] = np.zeros(256, np.float32)
    for i in range(2):
        for name, shape in [
            ("self_attn.q_proj", (256, 256)), ("self_attn.k_proj", (256, 256)),
            ("self_attn.v_proj", (256, 256)), ("self_attn.out_proj", (256, 256)),
            ("fc1", (1024, 256)), ("fc2", (256, 1024)),
        ]:
            lin(f"encoder.layers.{i}.{name}", shape)
        for name in ("self_attn_layer_norm", "final_layer_norm"):
            st[f"sr_predictor.encoder.layers.{i}.{name}.weight"] = np.ones(256, np.float32)
            st[f"sr_predictor.encoder.layers.{i}.{name}.bias"] = np.zeros(256, np.float32)

    upd = import_sr_predictor(st, num_layers=2)
    n = merge_subtree(p, upd)
    assert n > 20
    out = sr.apply({"params": p}, x)
    assert out.shape == (1, 1) and np.isfinite(np.asarray(out)).all()
