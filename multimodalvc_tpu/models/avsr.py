"""MMS-LLaMA-class AVSR model: frozen Whisper + AV-HuBERT -> Q-Former ->
LLaMA(LoRA), compiled as ONE XLA program per step.

Reference: src/model.py:35-634 (MMS_LLaMA).  The torch version is built from
Python per-sample loops — dynamic query counts (:564-582), per-sample
F.interpolate (:596-606), left-pad prompt assembly (:490-562).  Here every
one of those becomes a vectorized static-shape op:

 * query counts / resize factors -> int32 vectors driving masks;
 * per-sample time resize -> ops.interpolate.linear_resize_batched;
 * left-padded [pad | instruction | queries | labels] assembly -> a gather
   over a per-slot content-index grid (assemble_left_padded below);

so the whole encoder+LLM forward jits once per length bucket and runs on
the MXU without host sync.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_model
from ..nn.avhubert import AVHubertConfig, AVHubertModel
from ..nn.llama import LlamaConfig, LlamaModel, cross_entropy_lm_loss, generate_beam
from ..nn.modules import MultimodalAttention, Projector, SpeechRatePredictor
from ..nn.qformer import QFormer, QFormerConfig
from ..nn.whisper import WhisperEncoder, WhisperEncoderConfig
from ..ops.interpolate import linear_resize_batched

LLAMA3_EOS = 128001  # <|end_of_text|>
LLAMA3_PAD = 128004  # <|finetune_right_pad_id|> (src/model.py:473,539)
IGNORE_INDEX = -100


@dataclass
class AVSRConfig:
    whisper: WhisperEncoderConfig = field(default_factory=WhisperEncoderConfig)
    avhubert: AVHubertConfig = field(default_factory=AVHubertConfig)
    llama: LlamaConfig = field(default_factory=LlamaConfig)
    qformer_layers: int = 2
    qformer_dim: int = 1024
    modality_fuse: str = "concat"  # concat | add | cross-att
    use_qformer: bool = True
    queries_per_sec: int = 3  # train recipe (scripts/train.sh:12)
    use_sr_predictor: bool = True
    sr_predictor_layers: int = 2
    max_video_frames: int = 500  # 20 s at 25 Hz (src/conf/mms-llama.yaml:38)
    eos_token_id: int = LLAMA3_EOS
    pad_token_id: int = LLAMA3_PAD
    # NoLLM-style modality dropout: learned mask embeddings replace a whole
    # encoder stream (src/modelSpeechNoLLM.py:169-171,312-322)
    modality_dropout: bool = False

    @property
    def max_queries(self) -> int:
        # reference: queries_per_sec * 20 (*2 with SR predictor), model.py:116-119
        return int(self.queries_per_sec * 20 * (2 if self.use_sr_predictor else 1))

    @property
    def fused_dim(self) -> int:
        a = 1024  # whisper/avhubert embed dims
        return 2 * a if self.modality_fuse == "concat" else a

    @classmethod
    def tiny(cls):
        return cls(
            whisper=WhisperEncoderConfig(
                n_mels=80, d_model=64, num_layers=2, num_heads=4, ffn_dim=128, max_frames=64
            ),
            avhubert=AVHubertConfig.tiny(),
            # 512 tokens covers the byte-level CharTokenizer (ids up to 258)
            llama=LlamaConfig.tiny(vocab_size=512),
            qformer_dim=32,
            queries_per_sec=2,
            use_sr_predictor=True,
            max_video_frames=16,
            eos_token_id=2,
            pad_token_id=0,
        )


class AVSREncoder(nn.Module):
    """Everything before the LLM: acoustic/visual encoders -> fused queries."""

    cfg: AVSRConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        audio_feats: jnp.ndarray,  # [B, n_mels, 2*F] whisper log-mel
        video: jnp.ndarray,  # [B, T_v, H, W, 1]
        video_lengths: jnp.ndarray,  # [B]
        train: bool = False,
        modality_mode: Optional[jnp.ndarray] = None,  # 0=av, 1=video_only, 2=audio_only
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (queries [B, Q, llama_dim], query_lens [B])."""
        cfg = self.cfg
        t_v = video.shape[1]
        fused_a = 1024 if cfg.whisper.d_model == 1024 else cfg.whisper.d_model

        # frozen encoders (stop_gradient mirrors torch.no_grad, model.py:280-288)
        whisper_out = WhisperEncoder(cfg.whisper, dtype=self.dtype, name="whisper")(
            audio_feats, deterministic=True
        )
        whisper_out = jax.lax.stop_gradient(whisper_out)
        av_out = AVHubertModel(cfg.avhubert, dtype=self.dtype, name="avhubert")(
            video=video, lengths=video_lengths, train=False
        )
        av_out = jax.lax.stop_gradient(av_out)
        if av_out.shape[-1] != fused_a:
            av_out = nn.Dense(fused_a, dtype=self.dtype, name="avhubert_bridge")(av_out)

        # speech-rate-aware query budget (model.py:564-582)
        base_queries = video_lengths.astype(jnp.float32) / 25.0 * cfg.queries_per_sec
        if cfg.use_sr_predictor:
            sr_in = whisper_out[:, : 2 * t_v : 4, :]  # 50Hz -> 12.5Hz view
            if sr_in.shape[-1] != 1024:
                sr_in = nn.Dense(1024, dtype=self.dtype, name="sr_bridge")(sr_in)
            factor = SpeechRatePredictor(cfg.sr_predictor_layers, dtype=self.dtype, name="sr_predictor")(
                sr_in, deterministic=True
            )[:, 0]
            factor = jax.lax.stop_gradient(factor)
            factor = jnp.clip(factor, 1.0, 2.0)  # out-of-range -> clamp (:573-576)
        else:
            factor = jnp.ones_like(base_queries)
        query_lens = jnp.maximum(
            (base_queries * factor).astype(jnp.int32), cfg.queries_per_sec
        )
        query_lens = jnp.minimum(query_lens, cfg.max_queries)
        resized_lens = jnp.maximum((factor * video_lengths.astype(jnp.float32)).astype(jnp.int32), 1)

        # 50 Hz -> 25 Hz audio conv, then align to video frames (model.py:304,319)
        a = nn.Conv(
            fused_a, (2,), strides=(2,), padding="VALID", dtype=self.dtype, name="afeat_1d_conv"
        )(whisper_out)
        a = a[:, :t_v, :]

        if cfg.modality_dropout:
            audio_mask_emb = self.param(
                "audio_mask_emb", nn.initializers.uniform(1.0), (fused_a,)
            )
            video_mask_emb = self.param(
                "video_mask_emb", nn.initializers.uniform(1.0), (av_out.shape[-1],)
            )
            mode = modality_mode if modality_mode is not None else jnp.zeros((), jnp.int32)
            a = jnp.where(mode == 1, jnp.broadcast_to(audio_mask_emb, a.shape).astype(a.dtype), a)
            av_out = jnp.where(
                mode == 2,
                jnp.broadcast_to(video_mask_emb, av_out.shape).astype(av_out.dtype),
                av_out,
            )

        if cfg.modality_fuse == "concat":
            av_feat = jnp.concatenate([a, av_out], axis=-1)
        elif cfg.modality_fuse == "add":
            av_feat = a + av_out
        elif cfg.modality_fuse == "cross-att":
            av_feat = MultimodalAttention(num_heads=8, dtype=self.dtype, name="fusion")(
                a, av_out, kv_lens=video_lengths
            )
        else:
            raise ValueError(cfg.modality_fuse)

        # speech-rate resize (model.py:596-606) — static 2x budget
        t_resized = 2 * t_v
        av_feat = linear_resize_batched(
            av_feat, video_lengths, resized_lens, t_resized
        )

        q_cfg = QFormerConfig(
            num_layers=cfg.qformer_layers,
            hidden_size=cfg.qformer_dim,
            num_heads=max(cfg.qformer_dim // 64, 1),
            intermediate_size=cfg.qformer_dim * 4,
            encoder_width=av_feat.shape[-1],
            max_queries=cfg.max_queries,
        )
        queries = QFormer(q_cfg, dtype=self.dtype, name="qformer")(
            av_feat,
            query_lens=query_lens,
            enc_lens=resized_lens,
            deterministic=not train,
        )
        llama_dim = cfg.llama.hidden_size
        queries = Projector(
            hidden_dim=(cfg.qformer_dim + llama_dim) // 2,
            output_dim=llama_dim,
            dtype=self.dtype,
            name="avfeat_to_llm",
        )(queries)
        return queries, query_lens


def assemble_left_padded(
    pad_emb: jnp.ndarray,  # [D]
    inst_emb: jnp.ndarray,  # [B, Ti, D]
    queries: jnp.ndarray,  # [B, Q, D]
    query_lens: jnp.ndarray,  # [B]
    label_emb: Optional[jnp.ndarray] = None,  # [B, Tl, D]
    label_tokens: Optional[jnp.ndarray] = None,  # [B, Tl] (pad entries ignored)
    label_lens: Optional[jnp.ndarray] = None,  # [B]
):
    """Vectorized [pad.. | instruction | queries | labels] left-pad assembly.

    Replaces the reference's per-sample loop (src/model.py:490-562) with one
    gather: for each output slot j, the content index is j - (L - c_i); three
    range tests route it to instruction/queries/labels, everything else is
    the pad embedding.  Returns (embeds [B,L,D], attn_mask [B,L],
    labels [B,L] or None).
    """
    b, ti, d = inst_emb.shape
    q = queries.shape[1]
    tl = label_emb.shape[1] if label_emb is not None else 0
    l_total = ti + q + tl
    if label_lens is None:
        label_lens = jnp.zeros((b,), jnp.int32)

    content_len = ti + query_lens + label_lens  # [B]
    j = jnp.arange(l_total)[None, :]  # [1, L]
    ci = j - (l_total - content_len[:, None])  # [B, L] content index per slot

    in_inst = (ci >= 0) & (ci < ti)
    in_query = (ci >= ti) & (ci < ti + query_lens[:, None])
    in_label = ci >= ti + query_lens[:, None]

    inst_idx = jnp.clip(ci, 0, ti - 1)
    q_idx = jnp.clip(ci - ti, 0, q - 1)
    gathered_inst = jnp.take_along_axis(inst_emb, inst_idx[..., None], axis=1)
    gathered_q = jnp.take_along_axis(queries, q_idx[..., None], axis=1)

    out = jnp.where(in_inst[..., None], gathered_inst, pad_emb[None, None, :])
    out = jnp.where(in_query[..., None], gathered_q, out)
    attn_mask = (ci >= 0).astype(jnp.int32)
    labels_out = None
    if label_emb is not None:
        lab_idx = jnp.clip(ci - ti - query_lens[:, None], 0, tl - 1)
        gathered_lab = jnp.take_along_axis(label_emb, lab_idx[..., None], axis=1)
        out = jnp.where(in_label[..., None], gathered_lab, out)
        lab_tok = jnp.take_along_axis(label_tokens, lab_idx, axis=1)
        labels_out = jnp.where(in_label, lab_tok, IGNORE_INDEX)
    return out, attn_mask, labels_out


class AVSRModel(nn.Module):
    """Full training graph: encoder -> prompt assembly -> LLaMA LM loss."""

    cfg: AVSRConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = AVSREncoder(self.cfg, dtype=self.dtype)
        self.llama = LlamaModel(self.cfg.llama, dtype=self.dtype)

    def encode_queries(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        return self.encoder(
            batch["audio_feats"], batch["video"], batch["video_lengths"], train=train
        )

    def build_prompt(
        self,
        queries: jnp.ndarray,
        query_lens: jnp.ndarray,
        batch: Dict[str, jnp.ndarray],
        with_labels: bool,
    ):
        pad_emb = self.llama.embed(jnp.asarray(self.cfg.pad_token_id))
        inst_emb = self.llama.embed(batch["instruction"])
        if with_labels:
            label_emb = self.llama.embed(jnp.maximum(batch["labels"], 0))
            return assemble_left_padded(
                pad_emb,
                inst_emb,
                queries,
                query_lens,
                label_emb,
                batch["labels"],
                batch["label_lengths"],
            )
        return assemble_left_padded(pad_emb, inst_emb, queries, query_lens)

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        """Training/validation forward. Returns (loss, aux dict)."""
        queries, query_lens = self.encode_queries(batch, train=train)
        emb, attn_mask, labels = self.build_prompt(queries, query_lens, batch, True)
        out = self.llama(
            inputs_embeds=emb, attn_mask=attn_mask, deterministic=not train,
            return_hidden=True,
        )
        loss, n_correct, n_valid = cross_entropy_lm_loss(out["logits"], labels)
        return loss, {
            "logits": out["logits"],
            "labels": labels,
            "hidden": out["hidden"],
            "attn_mask": attn_mask,
            "query_lens": query_lens,
            "n_correct": n_correct,
            "n_valid": n_valid,
        }

    def prompt_for_generation(self, batch: Dict[str, jnp.ndarray]):
        queries, query_lens = self.encode_queries(batch, train=False)
        emb, attn_mask, _ = self.build_prompt(queries, query_lens, batch, False)
        return emb, attn_mask

    def prompt_for_training(self, batch: Dict[str, jnp.ndarray], train: bool = True):
        """Encoder + prompt assembly only (labels included) — the front half
        of __call__, for callers that run the LLaMA trunk separately (the
        pipeline-parallel loss path)."""
        queries, query_lens = self.encode_queries(batch, train=train)
        return self.build_prompt(queries, query_lens, batch, True)


def merge_token_rows(rows, eos_token_id: int, pad_token_id: int, dedup: bool = True):
    """Stitch per-chunk transcripts into one token row (whisper-style).

    Each row is cleaned (truncated at EOS, pad dropped); with ``dedup``
    consecutive rows are joined with the LONGEST exact suffix/prefix token
    overlap removed — the token-level analog of whisper's overlapped-window
    transcript merging.  ``dedup=False`` (used when the decode chunks do not
    overlap) concatenates unchanged, so genuinely repeated words across a
    chunk boundary survive.  Capability the reference lacks (clips are
    capped at 500 frames, src/conf/mms-llama.yaml:38).
    """

    def clean(row):
        out = []
        for t in row:
            t = int(t)
            if t == eos_token_id:
                break
            if t != pad_token_id:
                out.append(t)
        return out

    rows = list(rows)
    merged = clean(rows[0]) if rows else []
    for row in rows[1:]:
        nxt = clean(row)
        k = 0
        if dedup:
            for cand in range(min(len(merged), len(nxt)), 0, -1):
                if merged[len(merged) - cand :] == nxt[:cand]:
                    k = cand
                    break
        merged.extend(nxt[k:])
    return np.asarray(merged, np.int32)


@register_model("mms_llama_avsr", config=AVSRConfig)
class AVSRSystem:
    """Bundles the module with generation (HF-generate-equivalent decode)."""

    def __init__(self, cfg: AVSRConfig, dtype: jnp.dtype = jnp.float32):
        self.cfg = cfg
        self.module = AVSRModel(cfg, dtype=dtype)
        self.llama_module = LlamaModel(cfg.llama, dtype=dtype)
        self._gen_cache = {}

    @classmethod
    def from_config(cls, cfg):
        return cls(cfg)

    # everything frozen in the reference stays frozen here; LoRA leaves are
    # always trainable (handled by trainable_mask's always_train patterns)
    FROZEN_PATTERNS = [
        r"encoder/whisper/",
        r"encoder/avhubert/",
        r"encoder/sr_predictor/",
        r"^llama/",
    ]

    def frozen_patterns(self):
        return list(self.FROZEN_PATTERNS)

    def init(self, rng, batch):
        # jit the init: eager flax init interprets the whole forward op-by-op
        # (profiled at 31 s/call on the CLI smoke test even for tiny configs);
        # one compiled — and persistently cached — program runs in ~1 s
        return jax.jit(self.module.init)(rng, batch)

    def loss_fn(self, variables, batch, train=False, rngs=None):
        return self.module.apply(variables, batch, train=train, rngs=rngs)

    def make_trainer_loss_fn(self):
        """(params, collections, batch, rng) -> (loss, (metrics, collections))."""

        def loss_fn(params, collections, batch, rng):
            variables = {"params": params, **(collections or {})}
            loss, aux = self.module.apply(
                variables, batch, train=True, rngs={"dropout": rng}
            )
            import jax.numpy as _jnp

            metrics = {
                "accuracy": aux["n_correct"] / _jnp.maximum(aux["n_valid"], 1),
                "n_tokens": aux["n_valid"],
            }
            return loss, (metrics, collections)

        return loss_fn

    def make_pipeline_loss_fn(self, mesh, n_microbatches: int):
        """Loss fn with the LLaMA decoder pipelined over the mesh 'pipeline'
        axis (GPipe schedule; reference analog: fairseq
        pipeline_parallel_transformer via torch Pipe).  Encoders + prompt
        assembly run replicated/data-parallel; the 28-layer trunk — the bulk
        of the FLOPs — runs as P stages rotating activations over ICI.
        Stage params are sliced from the regular param tree inside the step,
        so checkpoints and the optimizer see the ordinary layout."""
        from ..nn.llama import cross_entropy_lm_loss, pipeline_lm_forward

        cfg = self.cfg

        def loss_fn(params, collections, batch, rng):
            variables = {"params": params, **(collections or {})}
            prompt_rng, trunk_rng = jax.random.split(rng)
            emb, attn_mask, labels = self.module.apply(
                variables, batch, True,
                rngs={"dropout": prompt_rng},
                method=AVSRModel.prompt_for_training,
            )
            lora = cfg.llama.lora
            use_dropout = lora is not None and getattr(lora, "dropout", 0.0) > 0
            logits = pipeline_lm_forward(
                cfg.llama,
                {"params": params["llama"]},
                emb,
                attn_mask,
                mesh,
                n_microbatches,
                dtype=self.module.dtype,
                # LoRA dropout now runs in PP too (reference trains with
                # dropout 0.05, src/model.py:244-252)
                dropout_rng=trunk_rng if use_dropout else None,
            )
            loss, n_correct, n_valid = cross_entropy_lm_loss(logits, labels)
            metrics = {
                "accuracy": n_correct / jnp.maximum(n_valid, 1),
                "n_tokens": n_valid,
            }
            return loss, (metrics, collections)

        return loss_fn

    def enable_quantized_decode(self, variables, mode: str = "int8"):
        """Switch decode to weight-only quantized serving: quantize the LLaMA
        trunk once (fused in-VMEM dequant matmuls, ops/int8_matmul.py) and
        return the variables tree to pass to generate().  Prompt assembly
        still reads the float embeddings; decode streams half (int8) or a
        quarter (int4, group-128) of the weight bytes per token.  Reference
        deviation note: the reference serves NF4 4-bit via bitsandbytes
        (src/model.py:231-238); int8 / int4-g128 are the TPU serving formats
        here."""
        import dataclasses

        from ..nn.llama import LlamaModel as _LM, quantize_llama_params

        cfg_q = dataclasses.replace(self.cfg.llama, weight_quant=mode)
        self.llama_module = _LM(cfg_q, dtype=self.llama_module.dtype)
        self._gen_cache.clear()
        q_params = dict(variables["params"])
        q_params["llama"] = quantize_llama_params(q_params["llama"], mode=mode)
        return {**variables, "params": q_params}

    # backwards-compat alias
    def enable_int8_decode(self, variables):
        return self.enable_quantized_decode(variables, mode="int8")

    def generate(
        self,
        variables,
        batch,
        num_beams: int = 5,
        max_new_tokens: int = 100,
        length_penalty: float = 1.0,
        no_repeat_ngram_size: int = 0,
        cache_dtype=jnp.bfloat16,
        ancestry_reorder: Optional[bool] = None,
        kv_quant: Optional[str] = None,
        encoder_microbatch: int = 0,
        constraints=None,
        constraints_mode: str = "unordered",
    ):
        """Beam-search transcription (reference: src/model.py:371-487).

        The entire pipeline — encoders, prompt assembly, prefill, and the
        while-loop decode — jits into ONE XLA program (cached per decode
        config), so a transcription is a single device dispatch.
        ``ancestry_reorder`` switches the beam reorder to the zero-traffic
        ancestry-select decode attention (ops/decode_attention.py); it is
        numerically equivalent to the gather reorder and measurably faster
        on TPU, so ``None`` (default) resolves to True on a TPU backend and
        False elsewhere (the CPU/interpret path favours the gather).
        ``kv_quant="int8"`` additionally serves the KV cache in int8 with
        in-VMEM dequant — a lossy serving format, so always opt-in.
        ``encoder_microbatch`` > 1 runs the encoders + prompt assembly in
        that many sequential batch chunks (``lax.map``): the video frontend's
        activation transients — the serving peak-memory driver — shrink by
        the chunk factor while the decode still runs at the full batch.

        ``constraints`` enables lexically-constrained transcription
        (fairseq-cli ``--constraints``, fairseq/fairseq_cli/generate.py +
        fairseq/fairseq/search.py:433-814): a per-sample list of constraint
        phrases, each a list of token ids (one outer entry per batch row;
        empty list = unconstrained row), or a pre-built
        ``ops.constraints.TrieArrays`` / ``SequenceArrays``.
        ``constraints_mode`` is "unordered" (LexicallyConstrainedBeamSearch)
        or "ordered" (phrases must appear in the given order).
        """
        if ancestry_reorder is None:
            ancestry_reorder = bool(kv_quant) or jax.default_backend() == "tpu"
        constraint_set = None
        if constraints is not None:
            from ..ops.constraints import (
                SequenceArrays,
                TrieArrays,
                build_ordered,
                build_unordered,
                pack_constraints,
            )

            if isinstance(constraints, (TrieArrays, SequenceArrays)):
                constraint_set = constraints
            else:
                packed = pack_constraints(constraints)
                build = (
                    build_ordered if constraints_mode == "ordered" else build_unordered
                )
                constraint_set = build(packed)
            # constrained decode runs physical-gather beam reorder inside
            # constrained_beam_search; ancestry/int8-KV fast paths are the
            # unconstrained serving loop's
            ancestry_reorder = False
            kv_quant = None
        key = (
            num_beams,
            max_new_tokens,
            length_penalty,
            no_repeat_ngram_size,
            jnp.dtype(cache_dtype).name,
            self.cfg.eos_token_id,
            self.cfg.pad_token_id,
            ancestry_reorder,
            kv_quant,
            encoder_microbatch,
            # constraint trie shapes + the static rewind bound retrace the
            # program; the array CONTENTS flow in as jit args below
            (type(constraint_set).__name__, constraint_set.max_depth, constraints_mode)
            if constraint_set is not None
            else None,
        )
        if key not in self._gen_cache:

            def _encode(v, batch):
                if encoder_microbatch > 1:
                    nb = next(iter(batch.values())).shape[0]
                    if nb % encoder_microbatch:
                        raise ValueError(
                            f"batch {nb} not divisible by encoder_microbatch "
                            f"{encoder_microbatch}"
                        )
                    m = encoder_microbatch
                    chunked = {
                        kk: x.reshape((m, nb // m) + x.shape[1:])
                        for kk, x in batch.items()
                    }
                    emb, attn_mask = jax.lax.map(
                        lambda ch: self.module.apply(
                            v, ch, method=AVSRModel.prompt_for_generation
                        ),
                        chunked,
                    )
                    return (
                        emb.reshape((-1,) + emb.shape[2:]),
                        attn_mask.reshape((-1,) + attn_mask.shape[2:]),
                    )
                return self.module.apply(
                    v, batch, method=AVSRModel.prompt_for_generation
                )

            cset_type = type(constraint_set) if constraint_set is not None else None
            static_depth = (
                constraint_set.max_depth if constraint_set is not None else None
            )

            def _gen(variables, batch, cset_arrays):
                # variables may be a LIST of trees — a checkpoint ensemble
                # (reference: checkpoint_utils.load_model_ensemble_and_task;
                # log-prob averaging happens inside generate_beam). Each
                # member runs its own encoders + prompt assembly.
                ens = variables if isinstance(variables, (list, tuple)) else [variables]
                embs, masks, lvars = [], [], []
                for v in ens:
                    emb, attn_mask = _encode(v, batch)
                    embs.append(emb)
                    masks.append(attn_mask)
                    lvars.append({"params": v["params"]["llama"]})
                if len(ens) == 1:
                    embs, masks, lvars = embs[0], masks[0], lvars[0]
                cset = None
                if cset_arrays is not None:
                    # reattach the static rewind bound (max_depth drives a
                    # fori_loop trip count, so it must stay a Python int)
                    cset = cset_type(*cset_arrays, max_depth=static_depth)
                return generate_beam(
                    self.llama_module,
                    lvars,
                    embs,
                    masks,
                    eos_token_id=self.cfg.eos_token_id,
                    pad_token_id=self.cfg.pad_token_id,
                    num_beams=num_beams,
                    max_new_tokens=max_new_tokens,
                    length_penalty=length_penalty,
                    no_repeat_ngram_size=no_repeat_ngram_size,
                    cache_dtype=cache_dtype,
                    ancestry_reorder=ancestry_reorder,
                    kv_quant=kv_quant,
                    constraints=cset,
                    constraints_mode=constraints_mode,
                )

            self._gen_cache[key] = jax.jit(_gen)
        cset_arrays = (
            tuple(constraint_set)[:-1] if constraint_set is not None else None
        )
        return self._gen_cache[key](variables, batch, cset_arrays)

    def generate_long_form(
        self,
        variables,
        batch,
        chunk_frames: int = 400,
        overlap_frames: int = 0,
        merge: bool = True,
        **gen_kwargs,
    ):
        """Chunked long-form transcription.

        The reference caps clips at 20 s (max_sample_size 500,
        src/conf/mms-llama.yaml:38) and cannot decode longer inputs; here
        arbitrary-length clips are decoded by sliding a chunk window over
        the video (audio features follow at 4 mel frames per 25 Hz video
        frame via the whisper 100 Hz alignment) and decoding each window
        with the cached single-chunk program.

        ``batch["audio_feats"]`` must be the FULL-CLIP mel features
        ([B, 80, >= 4 * video_frames]); compute them host-side with
        ``data.audio.whisper_features_long_np`` over the whole waveform — a
        single fixed 30 s whisper window would starve every later chunk.

        With ``merge`` (default), consecutive chunk transcripts are stitched
        whisper-style — pad/EOS stripped, then the longest exact
        suffix/prefix token overlap between neighbours is deduplicated
        (``merge_token_rows``) — returning ONE token row per sample.
        ``merge=False`` returns the raw per-chunk rows.
        """
        video = batch["video"]
        lengths = np.asarray(batch["video_lengths"])
        b, t_total = video.shape[0], video.shape[1]
        stride = chunk_frames - overlap_frames
        if stride <= 0:
            raise ValueError("overlap must be smaller than the chunk")
        audio_feats = batch["audio_feats"]
        # tolerance of 8 mel frames: whisper_features_long_np yields exactly
        # samples//160 frames, and real corpora round audio a frame or two
        # short of video_frames * 640 samples
        if t_total > chunk_frames and audio_feats.shape[-1] < 4 * int(max(lengths)) - 8:
            raise ValueError(
                f"audio_feats covers {audio_feats.shape[-1]} mel frames but the "
                f"clip spans {int(max(lengths))} video frames (~"
                f"{4 * int(max(lengths))} mel frames at 100 Hz); pass full-clip "
                "mel features (data.audio.whisper_features_long_np), not a "
                "single 30 s whisper window"
            )
        texts = [[] for _ in range(b)]
        for start in range(0, max(t_total - overlap_frames, 1), stride):
            end = min(start + chunk_frames, t_total)
            if end <= start:
                break
            pad = chunk_frames - (end - start)
            v = video[:, start:end]
            if pad:
                v = jnp.pad(v, ((0, 0), (0, pad)) + ((0, 0),) * (v.ndim - 2))
            chunk_lens = jnp.clip(
                jnp.asarray(lengths) - start, 0, chunk_frames
            ).astype(jnp.int32)
            # whisper features run at 100 Hz = 4x video rate; our encoder
            # consumes a 2*max_frames slice starting at the chunk
            a_start = min(4 * start, max(audio_feats.shape[-1] - 1, 0))
            a_window = 2 * self.cfg.whisper.max_frames  # the encoder's window
            a = audio_feats[..., a_start : a_start + a_window]
            a = jnp.pad(a, ((0, 0), (0, 0), (0, a_window - a.shape[-1])))
            chunk_batch = dict(batch)
            chunk_batch["video"] = v
            chunk_batch["video_lengths"] = jnp.maximum(chunk_lens, 1)
            chunk_batch["audio_feats"] = a
            seqs, _ = self.generate(variables, chunk_batch, **gen_kwargs)
            best = np.asarray(seqs[:, 0])
            for i in range(b):
                if chunk_lens[i] > 0:
                    texts[i].append(best[i])
        if not merge:
            return texts
        return [
            merge_token_rows(
                rows, self.cfg.eos_token_id, self.cfg.pad_token_id,
                # overlap dedup only when the windows actually overlap —
                # adjacent chunks may legitimately repeat tokens
                dedup=overlap_frames > 0,
            )
            for rows in texts
        ]
