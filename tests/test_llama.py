"""LLaMA decoder parity vs HF (random-init tiny config) + KV-cache checks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from multimodalvc_tpu.nn.llama import (  # noqa: E402
    LlamaConfig,
    LlamaModel,
    cross_entropy_lm_loss,
    import_hf_llama,
)


def make_hf_tiny():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rms_norm_eps=1e-5,
        rope_theta=500000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 32.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
        tie_word_embeddings=True,
        attn_implementation="eager",
    )
    # deterministic weights: unseeded torch init made the beam-parity tests
    # property tests over random draws — one draw exposed (and now pins) the
    # finalize live-vs-finished bug, but CI needs reproducibility
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    hf.eval()
    return hf


@pytest.fixture(scope="module")
def tiny_pair():
    hf = make_hf_tiny()
    cfg = LlamaConfig.tiny()
    cfg.lora = None
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    variables = import_hf_llama(state, cfg)
    return hf, LlamaModel(cfg), variables


def test_llama_logits_match_hf(tiny_pair, rng):
    hf, model, variables = tiny_pair
    ids = rng.integers(0, 256, (2, 12))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    out = model.apply(variables, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, rtol=1e-3, atol=2e-4)


def test_llama_left_padded_attention_mask(tiny_pair, rng):
    hf, model, variables = tiny_pair
    ids = rng.integers(0, 256, (2, 10))
    mask = np.ones((2, 10), dtype=np.int64)
    mask[1, :4] = 0  # left padding
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).logits.numpy()
    out = model.apply(
        variables, input_ids=jnp.asarray(ids), attn_mask=jnp.asarray(mask)
    )
    # compare only valid positions
    np.testing.assert_allclose(
        np.asarray(out["logits"])[1, 4:], ref[1, 4:], rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(out["logits"])[0], ref[0], rtol=1e-3, atol=2e-4)


def test_llama_inputs_embeds(tiny_pair, rng):
    hf, model, variables = tiny_pair
    emb = rng.standard_normal((1, 6, 64)).astype(np.float32) * 0.02
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.from_numpy(emb)).logits.numpy()
    out = model.apply(variables, inputs_embeds=jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, rtol=1e-3, atol=2e-4)


def test_kv_cache_decode_matches_full_forward(tiny_pair, rng):
    _, model, variables = tiny_pair
    ids = jnp.asarray(rng.integers(0, 256, (2, 8)))
    full = model.apply(variables, input_ids=ids)["logits"]

    cache = model.apply(
        variables, method=LlamaModel.init_cache, batch=2, max_len=16, dtype=jnp.float32
    )
    # prefill 6 tokens, then decode 2 one at a time
    mask = jnp.concatenate([jnp.ones((2, 6)), jnp.zeros((2, 10))], axis=1)
    out = model.apply(
        variables,
        input_ids=ids[:, :6],
        attn_mask=mask,
        positions=jnp.broadcast_to(jnp.arange(6)[None], (2, 6)),
        cache=cache,
    )
    cache = out["cache"]
    logits_t = out["logits"][:, -1]
    np.testing.assert_allclose(np.asarray(logits_t), np.asarray(full[:, 5]), rtol=1e-3, atol=2e-4)
    for t in range(6, 8):
        mask = (jnp.arange(16)[None, :] < t + 1).astype(jnp.int32) * jnp.ones((2, 1), jnp.int32)
        out = model.apply(
            variables,
            input_ids=ids[:, t : t + 1],
            attn_mask=mask,
            positions=jnp.full((2, 1), t),
            cache=cache,
        )
        cache = out["cache"]
        np.testing.assert_allclose(
            np.asarray(out["logits"][:, 0]), np.asarray(full[:, t]), rtol=1e-3, atol=3e-4
        )


def test_lora_zero_init_preserves_outputs(tiny_pair, rng):
    hf, _, _ = tiny_pair
    cfg = LlamaConfig.tiny()  # lora enabled by default
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    variables = import_hf_llama(state, cfg)
    model = LlamaModel(cfg)
    ids = jnp.asarray(rng.integers(0, 256, (1, 7)))
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.asarray(ids))).logits.numpy()
    out = model.apply(variables, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, rtol=1e-3, atol=2e-4)
    # lora params exist on targeted projections
    p = variables["params"]["layers_0"]["self_attn"]["q_proj"]
    assert "lora_a" in p and "lora_b" in p


def test_lm_loss_matches_hf(tiny_pair, rng):
    hf, model, variables = tiny_pair
    ids = rng.integers(0, 256, (2, 9))
    labels = ids.copy()
    labels[:, :3] = -100
    with torch.no_grad():
        ref_loss = float(
            hf(torch.from_numpy(ids), labels=torch.from_numpy(labels)).loss
        )
    out = model.apply(variables, input_ids=jnp.asarray(ids))
    loss, n_correct, n_valid = cross_entropy_lm_loss(out["logits"], jnp.asarray(labels))
    assert abs(float(loss) - ref_loss) < 2e-3
    # labels valid at positions 3..8 -> after shift, 6 per row
    assert int(n_valid) == 12


@pytest.mark.slow  # >25 s on a 1-core box; sibling tests cover the module
def test_remat_grads_match(rng):
    """cfg.remat=True recomputes activations without changing gradients."""
    import jax

    from multimodalvc_tpu.nn.llama import LlamaConfig, LlamaModel

    ids = jnp.asarray(rng.integers(1, 200, (2, 9)))
    cfg = LlamaConfig.tiny()
    cfg2 = LlamaConfig.tiny()
    cfg2.remat = True
    m1, m2 = LlamaModel(cfg), LlamaModel(cfg2)
    vs = m1.init(jax.random.PRNGKey(0), input_ids=ids)

    def loss(m):
        def f(p):
            out = m.apply({"params": p}, input_ids=ids)
            return jnp.sum(out["logits"].astype(jnp.float32) ** 2) * 1e-6
        return f

    g1 = jax.grad(loss(m1))(vs["params"])
    g2 = jax.grad(loss(m2))(vs["params"])
    diffs = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), g1, g2)
    )
    assert max(diffs) < 1e-5
