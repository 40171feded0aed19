"""On-hardware compiled-kernel verification: every Pallas kernel vs its oracle.

Interpret-mode tests (the CPU tier forced by tests/conftest.py) emulate
kernels with standard JAX ops, so they can NOT catch Mosaic *compiler*
failures — three classes shipped to hardware in round 4 (non-(8,128)
trailing block dims, multi-batch-dim einsums, rank-5 vector ops) and were
caught only by the driver bench.  This module runs each kernel COMPILED
(interpret=False) at production-relevant shapes and checks it against the
same pure-jnp oracle the interpret tests use.

Two consumers execute the same check registry:
  * ``pytest -m tpu`` (tests/test_tpu_kernels.py, needs MMVC_TPU_TESTS=1 so
    the conftest does not force the CPU backend), and
  * ``python bench.py --selftest`` — run by hand or by the driver before
    trusting a bench number.

Reference analog: fairseq's hardware-gated test tier
(fairseq/tests/gpu/test_binaries_gpu.py, skipped without CUDA).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

CHECKS: Dict[str, Callable[[], dict]] = {}


def _check(name: str):
    def reg(fn):
        CHECKS[name] = fn
        return fn

    return reg


def _result(name: str, got, want, tol: float, exact: bool = False) -> dict:
    got = np.asarray(jax.device_get(got), dtype=np.float64)
    want = np.asarray(jax.device_get(want), dtype=np.float64)
    if exact:
        err = float(np.max(got != want)) if got.size else 0.0
    else:
        err = float(np.max(np.abs(got - want))) if got.size else 0.0
    return {"name": name, "max_err": err, "tol": tol, "ok": bool(err <= tol)}


def _worst(name: str, results: List[dict]) -> dict:
    """Collapse sub-results into one record keyed by the worst margin."""
    bad = [r for r in results if not r["ok"]]
    pick = bad[0] if bad else max(results, key=lambda r: r["max_err"] / max(r["tol"], 1e-30))
    return {"name": name, "max_err": pick["max_err"], "tol": pick["tol"],
            "ok": all(r["ok"] for r in results)}


# ---- flash attention (ops/attention.py) --------------------------------------


@_check("flash_fwd_encoder")
def _flash_fwd_encoder():
    """Whisper/AV-HuBERT encoder shape: long sequence, d=64, kv_lens mask.

    Hits the single-kv-block fast path (tk <= 1536) whose cross-block rescale
    removal is v5e-specific.
    """
    from .attention import _windowed_reference_attention, flash_attention

    rng = np.random.default_rng(0)
    b, h, t, d = 2, 16, 768, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    kv_lens = jnp.asarray([700, 512], jnp.int32)
    starts = jnp.zeros((b,), jnp.int32)
    got = jax.jit(functools.partial(flash_attention, causal=False))(
        q, k, v, kv_lens=kv_lens
    )
    want = _windowed_reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        kv_lens, starts, False, 1.0 / np.sqrt(d),
    )
    return _result("flash_fwd_encoder", got.astype(jnp.float32), want, tol=3e-2)


@_check("flash_fwd_llama_prefill")
def _flash_fwd_llama_prefill():
    """LLaMA prefill shape: causal, d=128, left-padded window via kv_starts."""
    from .attention import _windowed_reference_attention, flash_attention

    rng = np.random.default_rng(1)
    b, h, t, d = 2, 24, 256, 128
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    kv_lens = jnp.asarray([256, 200], jnp.int32)
    kv_starts = jnp.asarray([0, 37], jnp.int32)
    got = jax.jit(
        functools.partial(flash_attention, causal=True)
    )(q, k, v, kv_lens=kv_lens, kv_starts=kv_starts)
    want = _windowed_reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        kv_lens, kv_starts, True, 1.0 / np.sqrt(d),
    )
    return _result("flash_fwd_llama_prefill", got.astype(jnp.float32), want, tol=3e-2)


@_check("flash_fwd_llama_prefill_1kb")
def _flash_fwd_llama_prefill_1kb():
    """Long-prompt prefill (t=512, d=128): hits the single-kv-block schedule
    the r5 auto gate enables (ops/attention.py d<=128 branch) — the measured
    1.4-1.6x win region vs XLA fused attention."""
    from .attention import _windowed_reference_attention, flash_attention

    rng = np.random.default_rng(14)
    b, h, t, d = 8, 24, 512, 128
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    kv_lens = jnp.full((b,), t, jnp.int32)
    kv_starts = jnp.asarray([0, 63, 0, 0, 17, 0, 0, 128], jnp.int32)
    got = jax.jit(functools.partial(flash_attention, causal=True))(
        q, k, v, kv_lens=kv_lens, kv_starts=kv_starts
    )
    want = _windowed_reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        kv_lens, kv_starts, True, 1.0 / np.sqrt(d),
    )
    return _result(
        "flash_fwd_llama_prefill_1kb", got.astype(jnp.float32), want, tol=3e-2
    )


@_check("flash_vjp")
def _flash_vjp():
    """Backward pass: the custom VJP recomputes on the XLA reference path, so
    grads must track jax.grad of the reference closely."""
    from .attention import _windowed_reference_attention, flash_attention

    rng = np.random.default_rng(2)
    b, h, t, d = 1, 4, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32) * 0.3
    kv_lens = jnp.asarray([220], jnp.int32)
    starts = jnp.zeros((b,), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_lens=kv_lens, causal=True) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(
            _windowed_reference_attention(
                q, k, v, kv_lens, starts, True, 1.0 / np.sqrt(d)
            )
            * cot
        )

    g_k = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2)))(q, k, v)
    g_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    subs = [
        _result(f"flash_vjp/{n}", a, b_, tol=2e-3)
        for n, a, b_ in zip("qkv", g_k, g_r)
    ]
    return _worst("flash_vjp", subs)


# ---- decode attention (ops/decode_attention.py) -------------------------------


def _decode_gen_case(quant: bool, seed: int) -> dict:
    from .decode_attention import (
        gen_attention_ancestor,
        gen_attention_ancestor_ref,
        quantize_kv,
    )

    rng = np.random.default_rng(seed)
    b, beams, slots, g, h, d = 2, 5, 64, 8, 24, 128
    rows = b * beams
    q = jnp.asarray(rng.standard_normal((rows, h, d)), jnp.float32)
    gk = jnp.asarray(rng.standard_normal((rows, slots, g, d)), jnp.bfloat16)
    gv = jnp.asarray(rng.standard_normal((rows, slots, g, d)), jnp.bfloat16)
    anc = jnp.asarray(rng.integers(0, beams, (rows, slots)), jnp.int32)
    valid = jnp.int32(41)
    scale = 1.0 / np.sqrt(d)
    kw = {}
    if quant:
        gk, ks = quantize_kv(gk)
        gv, vs = quantize_kv(gv)
        kw = dict(k_scale=ks, v_scale=vs)
    name = "decode_gen_ancestor_" + ("int8" if quant else "bf16")
    got = jax.jit(
        functools.partial(
            gen_attention_ancestor, beams=beams, scale=scale, interpret=False
        )
    )(q, gk, gv, anc, valid, **kw)
    want = gen_attention_ancestor_ref(q, gk, gv, anc, valid, beams=beams, scale=scale, **kw)
    subs = [
        _result(f"{name}/{part}", a, b_, tol=tol)
        for part, a, b_, tol in [
            ("out", got[0], want[0], 5e-2),
            ("m", got[1], want[1], 5e-2),
            ("l", got[2], want[2], 5e-2),
        ]
    ]
    return _worst(name, subs)


@_check("decode_gen_ancestor_bf16")
def _decode_gen_bf16():
    return _decode_gen_case(False, 3)


@_check("decode_gen_ancestor_int8")
def _decode_gen_int8():
    return _decode_gen_case(True, 4)


def _decode_prompt_case(quant: bool, seed: int) -> dict:
    from .decode_attention import (
        prompt_attention,
        prompt_attention_ref,
        quantize_kv,
    )

    rng = np.random.default_rng(seed)
    b, beams, tp, g, h, d = 2, 5, 256, 8, 24, 128
    rows = b * beams
    q = jnp.asarray(rng.standard_normal((rows, h, d)), jnp.float32)
    pk = jnp.asarray(rng.standard_normal((b, g, tp, d)), jnp.bfloat16)
    pv = jnp.asarray(rng.standard_normal((b, g, tp, d)), jnp.bfloat16)
    mask = np.ones((b, tp), np.int32)
    mask[1, :60] = 0  # left pad
    mask = jnp.asarray(mask)
    scale = 1.0 / np.sqrt(d)
    kw = {}
    if quant:
        pk, ks = quantize_kv(pk)
        pv, vs = quantize_kv(pv)
        kw = dict(k_scale=ks, v_scale=vs)
    name = "decode_prompt_" + ("int8" if quant else "bf16")
    got = jax.jit(
        functools.partial(prompt_attention, beams=beams, scale=scale, interpret=False)
    )(q, pk, pv, mask, **kw)
    want = prompt_attention_ref(q, pk, pv, mask, beams=beams, scale=scale, **kw)
    subs = [
        _result(f"{name}/{part}", a, b_, tol=tol)
        for part, a, b_, tol in [
            ("out", got[0], want[0], 5e-2),
            ("m", got[1], want[1], 5e-2),
            ("l", got[2], want[2], 5e-2),
        ]
    ]
    return _worst(name, subs)


@_check("decode_prompt_bf16")
def _decode_prompt_bf16():
    return _decode_prompt_case(False, 5)


@_check("decode_prompt_int8")
def _decode_prompt_int8():
    return _decode_prompt_case(True, 6)


# ---- beam-search kernels (ops/topk.py, ops/beam_gather.py) --------------------


@_check("beam_topk")
def _beam_topk():
    """Production candidate row: [B, K, V] = [4, 5, 128256] vs lax.top_k,
    values AND indices exact (indices drive beam selection)."""
    from .topk import beam_topk

    rng = np.random.default_rng(7)
    b, k, v, n = 4, 5, 128256, 10
    logp = jnp.asarray(rng.standard_normal((b, k, v)), jnp.float32)
    scores = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
    got_v, got_i = jax.jit(
        functools.partial(beam_topk, n=n, interpret=False)
    )(logp, scores)
    want_v, want_i = jax.lax.top_k(
        (scores[:, :, None] + logp).reshape(b, k * v), n
    )
    return _worst(
        "beam_topk",
        [
            _result("beam_topk/values", got_v, want_v, tol=1e-6),
            _result("beam_topk/indices", got_i, want_i, tol=0.0, exact=True),
        ],
    )


@_check("beam_topk_from_logits")
def _beam_topk_from_logits():
    """Fused serving path at the production shape: RAW [B*K, V] unembed
    logits + per-row max/logsumexp vs lax.top_k over
    scores + log_softmax(logits) — values AND indices exact (the kernel
    replays XLA's ((x - max) - logS) + score op order)."""
    from .topk import beam_topk_from_logits

    rng = np.random.default_rng(11)
    b, k, v, n = 48, 5, 128256, 10
    logits = jnp.asarray(rng.standard_normal((b * k, v)) * 3.0, jnp.float32)
    scores = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)

    def run(lf, sc):
        row_max = jnp.max(lf, axis=-1, keepdims=True)
        row_ls = jnp.log(jnp.sum(jnp.exp(lf - row_max), axis=-1, keepdims=True))
        return beam_topk_from_logits(lf, row_max, row_ls, sc, n, interpret=False)

    got_v, got_i = jax.jit(run)(logits, scores)
    logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)
    want_v, want_i = jax.lax.top_k(
        (scores[:, :, None] + logp).reshape(b, k * v), n
    )
    return _worst(
        "beam_topk_from_logits",
        [
            _result("beam_topk_from_logits/values", got_v, want_v, tol=1e-6),
            _result("beam_topk_from_logits/indices", got_i, want_i, tol=0.0, exact=True),
        ],
    )


@_check("beam_topk_columns")
def _beam_topk_columns():
    """Column-champion top-2K at the production shape, incl. the
    multi-winners-in-one-column case the gather+merge must cover."""
    from .topk import beam_topk_columns

    rng = np.random.default_rng(13)
    b, k, v, n = 48, 5, 128256, 10
    logits_np = (rng.standard_normal((b * k, v)) * 3.0).astype(np.float32)
    logits_np[0 * k + 0, 999] = 40.0  # one column winning for 3 beam rows
    logits_np[0 * k + 1, 999] = 39.5
    logits_np[0 * k + 3, 999] = 39.0
    logits = jnp.asarray(logits_np)
    scores = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)

    def run(lf, sc):
        row_max = jnp.max(lf, axis=-1, keepdims=True)
        row_ls = jnp.log(jnp.sum(jnp.exp(lf - row_max), axis=-1, keepdims=True))
        return beam_topk_columns(lf, row_max, row_ls, sc, n, interpret=False)

    got_v, got_i = jax.jit(run)(logits, scores)
    logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)
    want_v, want_i = jax.lax.top_k(
        (scores[:, :, None] + logp).reshape(b, k * v), n
    )
    return _worst(
        "beam_topk_columns",
        [
            _result("beam_topk_columns/values", got_v, want_v, tol=1e-6),
            _result("beam_topk_columns/indices", got_i, want_i, tol=0.0, exact=True),
        ],
    )


@_check("beam_gather_rows")
def _beam_gather_rows():
    """DMA row gather over a KV-cache-shaped leaf vs take_along_axis."""
    from .beam_gather import gather_rows

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((40, 64, 8, 128)), jnp.bfloat16)
    src = jnp.asarray(rng.integers(0, 40, (40,)), jnp.int32)
    got = jax.jit(functools.partial(gather_rows, interpret=False))(x, src)
    want = jnp.take(x, src, axis=0)
    return _result(
        "beam_gather_rows",
        got.astype(jnp.float32),
        want.astype(jnp.float32),
        tol=0.0,
        exact=True,
    )


# ---- quantized matmuls (ops/int8_matmul.py) -----------------------------------


@_check("int8_matmul_trunk")
def _int8_matmul_trunk():
    """Decode-shape trunk matmul (rows<=512 kernel path), 3072x3072."""
    from .int8_matmul import int8_matmul, quantize_kernel

    rng = np.random.default_rng(9)
    rows, d_in, d_out = 240, 3072, 3072
    w = jnp.asarray(rng.standard_normal((d_in, d_out)) * 0.02, jnp.float32)
    w_q, w_s = quantize_kernel(w)
    x = jnp.asarray(rng.standard_normal((rows, d_in)), jnp.bfloat16)
    got = jax.jit(
        functools.partial(int8_matmul, out_dtype=jnp.float32, interpret=False)
    )(x, w_q, w_s)
    want = (
        jnp.einsum(
            "rd,df->rf",
            x.astype(jnp.bfloat16),
            w_q.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        * w_s.reshape(1, -1)
    )
    return _result("int8_matmul_trunk", got, want, tol=1e-2)


@_check("int8_matmul_unembed")
def _int8_matmul_unembed():
    """Wide-output path (d_out >= 16384: the tied-lm-head block schedule)."""
    from .int8_matmul import int8_matmul, quantize_kernel

    rng = np.random.default_rng(10)
    rows, d_in, d_out = 240, 1024, 16384
    w = jnp.asarray(rng.standard_normal((d_in, d_out)) * 0.02, jnp.float32)
    w_q, w_s = quantize_kernel(w)
    x = jnp.asarray(rng.standard_normal((rows, d_in)), jnp.bfloat16)
    got = jax.jit(
        functools.partial(int8_matmul, out_dtype=jnp.float32, interpret=False)
    )(x, w_q, w_s)
    want = (
        jnp.einsum(
            "rd,df->rf",
            x.astype(jnp.bfloat16),
            w_q.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        * w_s.reshape(1, -1)
    )
    return _result("int8_matmul_unembed", got, want, tol=1e-2)


@_check("int4_matmul")
def _int4_matmul():
    from .int8_matmul import INT4_GROUP, int4_matmul, quantize_kernel_int4

    rng = np.random.default_rng(11)
    rows, d_in, d_out = 240, 1024, 2048
    w = jnp.asarray(rng.standard_normal((d_in, d_out)) * 0.02, jnp.float32)
    w_q, w_s = quantize_kernel_int4(w)
    x = jnp.asarray(rng.standard_normal((rows, d_in)), jnp.bfloat16)
    got = jax.jit(
        functools.partial(int4_matmul, out_dtype=jnp.float32, interpret=False)
    )(x, w_q, w_s)
    # unpack-dequant oracle: nibbles are half-split over the input axis,
    # scales are per (group, out-channel)
    p = np.asarray(w_q).astype(np.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = p >> 4
    q = np.concatenate([lo, hi], axis=0).astype(np.float32)
    w_deq = (
        q.reshape(d_in // INT4_GROUP, INT4_GROUP, d_out) * np.asarray(w_s)[:, None, :]
    ).reshape(d_in, d_out)
    want = np.asarray(x, np.float32) @ w_deq
    return _result("int4_matmul", got, want, tol=5e-2)


# ---- end-to-end decode smoke ---------------------------------------------------


@_check("generate_smoke")
def _generate_smoke():
    """Tiny on-chip generate(): the ancestry+int8-KV serving path vs the
    physical-gather default path, both compiled — the end-to-end glue check
    that would have caught the 9d17ce8 regressions.

    The two paths compute attention with DIFFERENT (algebraically equal)
    algorithms, so bf16 rounding can flip near-tied beam picks on a random
    tiny model — token equality is too strict on hardware (it held only in
    interpret mode, where both paths share the jnp fallback).  A broken
    kernel, however, produces garbage attention and beam SCORES far outside
    rounding range, so the check compares final beam scores within a tight
    tolerance and separately requires each path to be self-deterministic.
    Per-kernel exactness lives in the oracle checks above."""
    from flax.core import unfreeze

    from ..nn.llama import LlamaConfig, LlamaModel, generate_beam

    cfg = LlamaConfig.tiny()
    cfg.lora = None
    model = LlamaModel(cfg)
    rng = np.random.default_rng(12)
    emb = jnp.asarray(rng.standard_normal((2, 7, cfg.hidden_size)) * 0.05, jnp.float32)
    mask = np.ones((2, 7), np.int32)
    mask[1, :3] = 0
    mask = jnp.asarray(mask)
    variables = unfreeze(
        model.init(
            jax.random.PRNGKey(0),
            inputs_embeds=jnp.zeros((1, 4, cfg.hidden_size), jnp.float32),
        )
    )
    kw = dict(eos_token_id=2, pad_token_id=0, num_beams=5, max_new_tokens=8)
    seq_default, sc_default = generate_beam(model, variables, emb, mask, **kw)
    seq_anc, sc_anc = generate_beam(
        model, variables, emb, mask, ancestry_reorder=True, **kw
    )
    seq_anc2, _ = generate_beam(
        model, variables, emb, mask, ancestry_reorder=True, **kw
    )
    subs = [
        _result("generate_smoke/scores", sc_anc, sc_default, tol=0.1),
        _result("generate_smoke/deterministic", seq_anc2, seq_anc, tol=0.0, exact=True),
    ]
    # int8 KV is lossy by design; require a completed run with valid ids
    for tag, kkw in [("int8", dict(kv_quant="int8")), ("default", {})]:
        seq_q = (
            generate_beam(
                model, variables, emb, mask, ancestry_reorder=True, **kkw, **kw
            )[0]
            if tag == "int8"
            else seq_default
        )
        valid = bool(
            np.all(np.asarray(seq_q) >= 0)
            and np.all(np.asarray(seq_q) < cfg.vocab_size)
        )
        subs.append(
            {"name": f"generate_smoke/{tag}_valid", "max_err": 0.0 if valid else 1.0,
             "tol": 0.0, "ok": valid}
        )
    return _worst("generate_smoke", subs)


def run_all(names=None) -> List[dict]:
    """Execute the registered checks (all by default).  Exceptions become
    failed records — a Mosaic compile crash must fail the check, not the
    harness."""
    out = []
    for name, fn in CHECKS.items():
        if names and name not in names:
            continue
        try:
            out.append(fn())
        except Exception as e:  # noqa: BLE001 — any crash is a red check
            out.append(
                {"name": name, "max_err": float("inf"), "tol": 0.0, "ok": False,
                 "error": f"{type(e).__name__}: {e}"}
            )
    return out
