"""Fused int8-weight matmul kernel parity."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodalvc_tpu.ops.int8_matmul import int8_matmul, quantize_kernel


def _ref(x, w_q, scale):
    y = np.asarray(x, np.float32) @ np.asarray(w_q, np.float32)
    return y * np.asarray(scale, np.float32)[None, :]


def test_int8_matmul_matches_reference(rng):
    x = jnp.asarray((rng.standard_normal((40, 512)) * 0.3).astype(np.float32))
    w = (rng.standard_normal((512, 768)) * 0.05).astype(np.float32)
    w_q, scale = quantize_kernel(jnp.asarray(w))
    got = int8_matmul(x, w_q, scale, block_in=256, block_out=256, interpret=True)
    ref = _ref(np.asarray(x, np.float32), w_q, scale)
    # bf16 accumulate inside the kernel: tolerance at bf16 resolution
    np.testing.assert_allclose(np.asarray(got, np.float32), ref, rtol=2e-2, atol=2e-2)


def test_int8_matmul_leading_dims_and_odd_shapes(rng):
    x = jnp.asarray((rng.standard_normal((2, 3, 256)) * 0.3).astype(np.float32))
    w = (rng.standard_normal((256, 128)) * 0.05).astype(np.float32)
    w_q, scale = quantize_kernel(jnp.asarray(w))
    got = int8_matmul(x, w_q, scale, interpret=True)
    assert got.shape == (2, 3, 128)
    ref = _ref(np.asarray(x).reshape(6, 256), w_q, scale).reshape(2, 3, 128)
    np.testing.assert_allclose(np.asarray(got, np.float32), ref, rtol=2e-2, atol=2e-2)
    # odd d_in falls back to the XLA path, same semantics
    x2 = jnp.asarray((rng.standard_normal((4, 100)) * 0.3).astype(np.float32))
    w2 = (rng.standard_normal((100, 64)) * 0.05).astype(np.float32)
    w_q2, scale2 = quantize_kernel(jnp.asarray(w2))
    got2 = int8_matmul(x2, w_q2, scale2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got2, np.float32), _ref(np.asarray(x2), w_q2, scale2), rtol=2e-2, atol=2e-2
    )


def test_quantize_kernel_error_small(rng):
    w = (rng.standard_normal((256, 256)) * 0.05).astype(np.float32)
    w_q, scale = quantize_kernel(jnp.asarray(w))
    back = np.asarray(w_q, np.float32) * np.asarray(scale)[None, :]
    rel = np.abs(back - w).max() / np.abs(w).max()
    assert rel < 0.01


def test_int4_matmul_matches_dequant_reference(rng):
    from multimodalvc_tpu.ops.int8_matmul import int4_matmul, quantize_kernel_int4

    d_in, d_out, group = 512, 384, 128
    x = jnp.asarray((rng.standard_normal((24, d_in)) * 0.3).astype(np.float32))
    w = (rng.standard_normal((d_in, d_out)) * 0.05).astype(np.float32)
    packed, scale = quantize_kernel_int4(jnp.asarray(w), group=group)
    assert packed.shape == (d_in // 2, d_out)
    assert scale.shape == (d_in // group, d_out)
    # numpy unpack-dequant oracle
    p = np.asarray(packed).astype(np.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = p >> 4
    q = np.concatenate([lo, hi], axis=0).astype(np.float32)
    wd = (q.reshape(d_in // group, group, d_out) * np.asarray(scale)[:, None, :]).reshape(
        d_in, d_out
    )
    ref = np.asarray(x, np.float32) @ wd
    got = int4_matmul(x, packed, scale, group=group, block_in=128, block_out=128,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), ref, rtol=3e-2, atol=3e-2)
    # XLA fallback (rows > 512) agrees too
    xb = jnp.asarray((rng.standard_normal((600, d_in)) * 0.3).astype(np.float32))
    got_b = int4_matmul(xb, packed, scale, group=group, interpret=True)
    ref_b = np.asarray(xb, np.float32) @ wd
    np.testing.assert_allclose(np.asarray(got_b, np.float32), ref_b, rtol=3e-2, atol=3e-2)


def test_quantize_int4_roundtrip_error(rng):
    from multimodalvc_tpu.ops.int8_matmul import quantize_kernel_int4

    w = (rng.standard_normal((1024, 256)) * 0.05).astype(np.float32)
    packed, scale = quantize_kernel_int4(jnp.asarray(w))
    p = np.asarray(packed).astype(np.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = p >> 4
    q = np.concatenate([lo, hi], axis=0).astype(np.float32)
    back = (q.reshape(8, 128, 256) * np.asarray(scale)[:, None, :]).reshape(1024, 256)
    # int4 symmetric g=128: worst-case per-element error is scale/2 ~ amax/14
    rel = np.abs(back - w).max() / np.abs(w).max()
    assert rel < 0.08, rel


@pytest.mark.slow  # >25 s on a 1-core box; sibling tests cover the module
def test_llama_int8_decode_close_to_float(rng):
    """int8 weight-only LLaMA: logits close to float; cached decode runs."""
    import dataclasses

    from multimodalvc_tpu.nn.llama import (
        LlamaConfig,
        LlamaModel,
        quantize_llama_params,
    )

    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg)
    b, t = 2, 12
    emb = jnp.asarray((rng.standard_normal((b, t, cfg.hidden_size)) * 0.05).astype(np.float32))
    mask = jnp.ones((b, t), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), inputs_embeds=emb, attn_mask=mask)
    ref = model.apply(variables, inputs_embeds=emb, attn_mask=mask)["logits"]

    cfg_q = dataclasses.replace(cfg, weight_quant="int8")
    model_q = LlamaModel(cfg_q)
    q_params = quantize_llama_params(variables["params"])
    got = model_q.apply({"params": q_params}, inputs_embeds=emb, attn_mask=mask)["logits"]
    # int8 weight error ~1/127 per channel; logits stay close
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale = max(np.abs(np.asarray(ref)).max(), 1e-6)
    assert err / scale < 0.05, err / scale

    # cached single-token decode works with the quantized tree
    cache = model_q.apply({"params": q_params}, method=LlamaModel.init_cache,
                          batch=b, max_len=t + 4, dtype=jnp.float32)
    full_mask = jnp.concatenate([mask, jnp.zeros((b, 4), jnp.int32)], axis=1)
    out = model_q.apply(
        {"params": q_params}, inputs_embeds=emb, attn_mask=full_mask,
        positions=jnp.broadcast_to(jnp.arange(t)[None], (b, t)),
        cache=cache,
        cache_positions=jnp.broadcast_to(jnp.arange(t)[None], (b, t)),
    )
    tok = jnp.argmax(out["logits"][:, -1:], axis=-1)
    step = model_q.apply(
        {"params": q_params}, input_ids=tok,
        attn_mask=jnp.concatenate([mask, jnp.ones((b, 4), jnp.int32)], axis=1),
        positions=jnp.full((b, 1), t, jnp.int32),
        cache=out["cache"],
        cache_positions=jnp.full((b, 1), t, jnp.int32),
    )
    assert np.isfinite(np.asarray(step["logits"])).all()


@pytest.mark.slow
def test_llama_int4_decode_close_to_float(rng):
    """int4-g128 weight-only LLaMA: logits close to float; beam decode runs.
    (Serving analog of the reference's NF4 4-bit, src/model.py:231-238.)"""
    import dataclasses

    from multimodalvc_tpu.nn.llama import (
        LlamaConfig,
        LlamaModel,
        generate_beam,
        quantize_llama_params,
    )

    # int4 group-128 needs d_in % 256 == 0 on every kernel
    cfg = LlamaConfig.tiny()
    cfg = dataclasses.replace(
        cfg, hidden_size=256, intermediate_size=512, num_heads=4,
        num_kv_heads=2, head_dim=64,
    )
    model = LlamaModel(cfg)
    b, t = 2, 9
    emb = jnp.asarray(
        (rng.standard_normal((b, t, cfg.hidden_size)) * 0.05).astype(np.float32)
    )
    mask = np.ones((b, t), dtype=np.int64)
    mask[0, :2] = 0
    variables = model.init(
        jax.random.PRNGKey(0), inputs_embeds=emb, attn_mask=jnp.asarray(mask, jnp.int32)
    )

    cfg_q = dataclasses.replace(cfg, weight_quant="int4")
    model_q = LlamaModel(cfg_q)
    qv = {"params": quantize_llama_params(variables["params"], mode="int4")}
    got = model_q.apply(
        qv, inputs_embeds=emb, attn_mask=jnp.asarray(mask, jnp.int32)
    )["logits"]

    # oracle: the FLOAT model on fake-quantized (dequantized-int4) kernels —
    # isolates kernel correctness from genuine int4 quantization noise
    def deq(node_q):
        p = np.asarray(node_q["w_packed"]).astype(np.int32)
        s = np.asarray(node_q["w_scale"])
        lo = ((p & 0xF) ^ 8) - 8
        q = np.concatenate([lo, p >> 4], axis=0).astype(np.float32)
        d_in, d_out = q.shape
        return jnp.asarray(
            (q.reshape(d_in // 128, 128, d_out) * s[:, None, :]).reshape(d_in, d_out)
        )

    import copy

    fp = copy.deepcopy(jax.tree.map(lambda x: x, variables["params"]))
    for lname, layer in fp.items():
        if not lname.startswith("layers_"):
            continue
        for pn in ("q_proj", "k_proj", "v_proj", "o_proj"):
            layer["self_attn"][pn]["base"]["kernel"] = deq(
                qv["params"][lname]["self_attn"][pn]["base_q"]
            )
        for pn in ("gate_proj", "up_proj", "down_proj"):
            layer["mlp"][pn]["kernel"] = deq(qv["params"][lname]["mlp"][pn])
    # the tied lm_head is quantized too (unembed_q); inputs arrive as embeds,
    # so swapping the oracle's table for dequant(unembed_q)^T is exact
    fp["embed_tokens"]["embedding"] = deq(qv["params"]["unembed_q"]).T
    ref = model.apply(
        {"params": fp}, inputs_embeds=emb, attn_mask=jnp.asarray(mask, jnp.int32)
    )["logits"]
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale = max(np.abs(np.asarray(ref)).max(), 1e-6)
    # bf16 matmul accumulation is the only remaining difference
    assert err / scale < 0.03, err / scale

    seqs, scores = generate_beam(
        model_q, qv, emb, jnp.asarray(mask),
        eos_token_id=2, pad_token_id=0, num_beams=3,
        max_new_tokens=5, cache_dtype=jnp.float32,
    )
    assert seqs.shape == (b, 3, 5)
    assert np.isfinite(np.asarray(scores)).all()


def test_llama_int8_beam_decode_split_cache(rng):
    """generate_beam (shared-prompt split KV cache — the serving hot path)
    runs end-to-end on an int8-quantized tree; regression for the o_proj
    quantized flag on the split-cache branch."""
    import dataclasses

    from multimodalvc_tpu.nn.llama import (
        LlamaConfig,
        LlamaModel,
        generate_beam,
        quantize_llama_params,
    )

    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg)
    b, t = 2, 7
    emb = jnp.asarray(
        (rng.standard_normal((b, t, cfg.hidden_size)) * 0.05).astype(np.float32)
    )
    mask = np.ones((b, t), dtype=np.int64)
    mask[1, :3] = 0
    variables = model.init(
        jax.random.PRNGKey(0), inputs_embeds=emb, attn_mask=jnp.asarray(mask, jnp.int32)
    )
    cfg_q = dataclasses.replace(cfg, weight_quant="int8")
    model_q = LlamaModel(cfg_q)
    qv = {"params": quantize_llama_params(variables["params"])}
    seqs, scores = generate_beam(
        model_q, qv, emb, jnp.asarray(mask),
        eos_token_id=2, pad_token_id=0, num_beams=3,
        max_new_tokens=6, cache_dtype=jnp.float32,
    )
    assert seqs.shape == (b, 3, 6)
    assert np.isfinite(np.asarray(scores)).all()
