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


@pytest.fixture(scope="module")
def reference_system():
    """The reference MMS_LLaMA (src/model.py:85-634) built from tiny-but-real
    parts, plus the raw components for weight export."""
    import importlib

    src = load_reference_product()
    mm = src.model
    smm = importlib.import_module("src.sub_model.modules")
    hubert_asr = importlib.import_module("avhubert.hubert_asr")

    whisper_enc = _make_hf_whisper_encoder()
    whisper = smm.WhisperEncoderWrapper(whisper_enc)
    hub_model = _make_vendored_avhubert()
    avhubert = hubert_asr.HubertEncoderWrapper(hub_model)
    hf_llama = _make_hf_llama()

    # SR predictor donor state: the ctor loads it via torch.load
    # (src/model.py:138-144), so serve our randomized copy through a patch
    donor_sr = smm.Speech_Rate_Predictor(num_layers=2).eval()
    _randomize_(donor_sr, seed=22)
    with torch.no_grad():
        donor_sr.sr_predictor.bias.fill_(1.4)  # predictions land in (1, 2)
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

    orig_bert_config, orig_load = mm.BertConfig, torch.load
    mm.BertConfig = type(
        "BertConfigStub", (), {"from_pretrained": staticmethod(lambda name: _tiny_bert_config())}
    )
    torch.load = lambda *a, **k: sr_state
    try:
        ref = mm.MMS_LLaMA(avhubert, whisper, hf_llama, _StubTokenizer(), cfg).eval()
    finally:
        mm.BertConfig, torch.load = orig_bert_config, orig_load
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
