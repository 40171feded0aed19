"""Activation parity against the ACTUAL vendored reference modules.

These tests import the reference's own torch code from /root/reference
(Qformer.py, resnet.py, divise_conformer, custom_hifigan) — not hand-built
oracles — randomize their weights, map the state dicts through our interop
import functions, and assert our flax modules produce the same activations
on identical inputs.  This is the WER-parity evidence obtainable without the
real checkpoints: it validates every import mapping end-to-end.

Reference modules that require fairseq import through the tests-only
omegaconf/hydra shim in tests/_vendored_fairseq.py (the vendored fairseq
tree itself is on disk), so even the 24-layer AV-HuBERT trunk is parity
tested against the real avhubert/hubert.py; the Whisper mel front end is
checked against the exact transformers WhisperFeatureExtractor the
reference calls via WhisperProcessor (src/dataset.py:185,310).
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_reference_paths():
    """Make the vendored reference importable under the installed libs.

    Newer transformers moved apply_chunking_to_forward and friends from
    modeling_utils to pytorch_utils; shim them back so the vendored
    Qformer.py (written against transformers 4.15) imports unmodified.
    """
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for name in (
        "apply_chunking_to_forward",
        "find_pruneable_heads_and_indices",
        "prune_linear_layer",
    ):
        if not hasattr(mu, name) and hasattr(pu, name):
            setattr(mu, name, getattr(pu, name))
    for path in (f"{REF}/src", f"{REF}/avhubert", f"{REF}/custom_hifigan"):
        if path not in sys.path:
            sys.path.append(path)  # append: never shadow installed packages


_install_reference_paths()


def _randomize_(module: torch.nn.Module, seed: int = 0) -> None:
    """Fill every tensor in the state dict with seeded random values (so
    running stats / weight-norm g's are exercised, not just fresh inits)."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            continue
        r = torch.randn(v.shape, generator=g) * 0.05
        if k.endswith("running_var"):
            r = r.abs() + 0.5
        elif k.endswith("weight_g") or ".norm.weight" in k or k.endswith("bn.weight"):
            r = r.abs() + 0.5
        v.copy_(r)
    module.load_state_dict(sd)


def _close(ours, theirs, rtol=1e-4, atol=1e-4, what=""):
    ours = np.asarray(ours, dtype=np.float32)
    theirs = np.asarray(theirs, dtype=np.float32)
    assert ours.shape == theirs.shape, (what, ours.shape, theirs.shape)
    np.testing.assert_allclose(ours, theirs, rtol=rtol, atol=atol, err_msg=what)


# ---------------------------------------------------------------------------
# Q-Former vs src/sub_model/Qformer.py (BertLMHeadModel query path)
# ---------------------------------------------------------------------------


def test_qformer_parity_vs_vendored_bert():
    """Our QFormer vs the vendored BLIP-2 BertModel exactly as the reference
    configures it (src/model.py:121-132: bert-large config, 2 layers, hidden
    1024, cross_attention_freq=1, query-only input) and invokes it
    (src/model.py:605-619: query_embeds + query mask + encoder states)."""
    from sub_model.Qformer import BertLMHeadModel
    from transformers.models.bert.configuration_bert import BertConfig

    from multimodalvc_tpu.interop.avsr_import import import_reference_avsr
    from multimodalvc_tpu.nn.qformer import QFormer, QFormerConfig

    max_q, enc_width, hidden = 6, 64, 32
    # bert-large field values the reference pulls via from_pretrained,
    # shrunk where the query path never reads them (vocab, positions)
    bert_cfg = BertConfig(
        vocab_size=32,
        hidden_size=hidden,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=hidden * 4,
        hidden_act="gelu",
        hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1,
        max_position_embeddings=16,
        layer_norm_eps=1e-12,
        pad_token_id=0,
    )
    bert_cfg.encoder_width = enc_width
    bert_cfg.add_cross_attention = True
    bert_cfg.cross_attention_freq = 1
    bert_cfg.query_length = max_q
    ref = BertLMHeadModel(config=bert_cfg).eval()
    _randomize_(ref, seed=1)
    query_tokens = torch.randn(1, max_q, hidden, generator=torch.Generator().manual_seed(2)) * 0.1

    b, t = 2, 11
    rng = np.random.default_rng(3)
    enc = rng.standard_normal((b, t, enc_width)).astype(np.float32)
    enc_lens = np.asarray([t, 7], np.int32)
    q_lens = np.asarray([max_q, 4], np.int32)

    # reference invocation (src/model.py:586-618)
    query_attn_mask = torch.zeros(b, max_q, dtype=torch.long)
    enc_mask = torch.zeros(b, t, dtype=torch.long)
    for i in range(b):
        query_attn_mask[i, : q_lens[i]] = 1
        enc_mask[i, : enc_lens[i]] = 1
    with torch.no_grad():
        ref_out = ref.bert(
            query_embeds=query_tokens.expand(b, -1, -1),
            attention_mask=query_attn_mask,
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=enc_mask,
            return_dict=True,
        )["last_hidden_state"].numpy()

    # ours, via the import mapping used for real checkpoints
    state = {f"Qformer.{k}": v.numpy() for k, v in ref.state_dict().items()}
    state["query_tokens"] = query_tokens.numpy()
    mapped = import_reference_avsr(state)["encoder"]["qformer"]

    import jax

    cfg = QFormerConfig(
        num_layers=2,
        hidden_size=hidden,
        num_heads=4,
        intermediate_size=hidden * 4,
        encoder_width=enc_width,
        max_queries=max_q,
    )
    model = QFormer(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, t, enc_width), np.float32),
        query_lens=np.ones(1, np.int32),
        enc_lens=np.ones(1, np.int32),
    )
    assert set(variables["params"]) == set(mapped), (
        set(variables["params"]) ^ set(mapped)
    )
    ours = model.apply(
        {"params": mapped}, enc, query_lens=q_lens, enc_lens=enc_lens
    )
    # compare valid query slots only (ours zeroes the padded ones)
    for i in range(b):
        _close(
            ours[i, : q_lens[i]],
            ref_out[i, : q_lens[i]],
            what=f"qformer row {i}",
        )


# ---------------------------------------------------------------------------
# Video front end vs avhubert/resnet.py ResEncoder
# ---------------------------------------------------------------------------


def test_resnet_parity_vs_vendored_resencoder():
    """Our ResEncoder vs avhubert/resnet.py:131-169 on a (B, T, 24, 24)
    grayscale clip, weights imported through map_resnet."""
    import resnet as ref_resnet

    import jax

    from multimodalvc_tpu.nn.avhubert import map_resnet
    from multimodalvc_tpu.nn.resnet import ResEncoder

    ref = ref_resnet.ResEncoder(relu_type="prelu", weights=None).eval()
    _randomize_(ref, seed=4)

    b, t, hw = 1, 3, 24
    rng = np.random.default_rng(5)
    video = rng.standard_normal((b, t, hw, hw, 1)).astype(np.float32)
    with torch.no_grad():
        # torch layout (B, C, T, H, W); output (B, 512, T)
        ref_out = (
            ref(torch.from_numpy(video.transpose(0, 4, 1, 2, 3)))
            .numpy()
            .transpose(0, 2, 1)
        )

    state = {f"r.{k}": v.numpy() for k, v in ref.state_dict().items()}
    params, stats = map_resnet(state, "r.")
    ours = ResEncoder(relu_type="prelu").apply(
        {"params": params, "batch_stats": stats}, video, train=False
    )
    _close(ours, ref_out, rtol=5e-4, atol=5e-4, what="resnet")


# ---------------------------------------------------------------------------
# Conformer vs src/divise_conformer (ESPnet-lineage Encoder)
# ---------------------------------------------------------------------------


def test_conformer_parity_vs_vendored_encoder():
    """Our ConformerEncoder vs the vendored divise_conformer
    ConformerEncoder(size='S') (src/divise_conformer/encoder.py:279-317) with
    weights imported through import_torch_conformer."""
    from divise_conformer.encoder import ConformerEncoder as RefConformer

    from multimodalvc_tpu.interop.speech_import import import_torch_conformer
    from multimodalvc_tpu.nn.conformer import ConformerConfig, ConformerEncoder

    ref = RefConformer(size="S").eval()
    _randomize_(ref, seed=6)

    b, t, d = 2, 17, 144
    rng = np.random.default_rng(7)
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), masks=None).numpy()

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = import_torch_conformer(state, num_blocks=3, prefix="encoder.")
    ours = ConformerEncoder(ConformerConfig.sized("S")).apply(
        variables, x, deterministic=True
    )
    _close(ours, ref_out, rtol=5e-4, atol=5e-4, what="conformer")


def test_conformer_parity_padded_buffer_amplified():
    """Static padded buffers + non-washout weights.

    _randomize_'s 0.55-ish LayerNorm gammas attenuate input deltas 0.38x per
    block, so the plain parity test above can pass while real signal paths
    diverge (r4 finding: the depthwise conv leaked pad-frame garbage 15
    frames into the valid region — invisible at washout scale).  Here norm
    gammas sit at ~1 and the content sublayers get 2x gain, each row runs at
    its own exact length on the torch side, and ours runs ONCE on a padded
    [B, 24] buffer with ``lengths`` — valid frames must match the
    exact-length reference runs."""
    import jax.numpy as jnp

    from divise_conformer.encoder import ConformerEncoder as RefConformer

    from multimodalvc_tpu.interop.speech_import import import_torch_conformer
    from multimodalvc_tpu.nn.conformer import ConformerConfig, ConformerEncoder

    ref = RefConformer(size="S").eval()
    _randomize_(ref, seed=6)
    g = torch.Generator().manual_seed(61)
    sd = ref.state_dict()
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            continue
        if "norm" in k and k.endswith("weight"):
            v.copy_(1.0 + 0.02 * torch.randn(v.shape, generator=g))
        elif k.endswith("weight") and any(
            s in k for s in ("feed_forward", "conv_module", "linear_v.", "linear_out.")
        ):
            v.mul_(2.0)
        elif k.endswith(("linear_q.weight", "linear_k.weight")):
            v.mul_(8.0)
    ref.load_state_dict(sd)

    b, t_buf, d = 2, 24, 144
    lens = [20, 9]
    rng = np.random.default_rng(7)
    x = rng.standard_normal((b, t_buf, d)).astype(np.float32)
    for i, ln in enumerate(lens):
        x[i, ln:] = 0.0

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = import_torch_conformer(state, num_blocks=3, prefix="encoder.")
    ours = np.asarray(
        ConformerEncoder(ConformerConfig.sized("S")).apply(
            variables, jnp.asarray(x), lengths=jnp.asarray(lens), deterministic=True
        ),
        np.float32,
    )
    # non-vacuous: without masking, the pad-frame garbage (LN'd biases + pos
    # encodings) leaks through the k=31 depthwise conv into the valid frames
    # — the r4 bug this test pins.  The masked run must diverge from it.
    unmasked = np.asarray(
        ConformerEncoder(ConformerConfig.sized("S")).apply(
            variables, jnp.asarray(x), deterministic=True
        ),
        np.float32,
    )
    assert np.abs(unmasked[1, : lens[1]] - ours[1, : lens[1]]).max() > 1e-2

    for i, ln in enumerate(lens):
        with torch.no_grad():
            ref_i = ref(torch.from_numpy(x[i : i + 1, :ln]), masks=None).numpy()
        _close(ours[i : i + 1, :ln], ref_i, rtol=2e-3, atol=2e-3, what=f"row {i}")


# ---------------------------------------------------------------------------
# HiFi-GAN vs custom_hifigan (generator + discriminators)
# ---------------------------------------------------------------------------


def _small_gen_kwargs():
    # shrink the upsampling chain (10x4 = 40x) for CPU speed; layer/kernel
    # structure identical to the reference defaults
    return dict(
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        upsample_kernel_sizes=(20, 8),
        upsample_factors=(10, 4),
        upsample_initial_channel=64,
    )


def test_hifigan_generator_parity_vs_vendored():
    """Our HifiGanGenerator vs custom_hifigan/hifigan/generator.py:14-213
    through import_torch_generator (weight-norm (v,g) preserved)."""
    from hifigan.generator import HifiganGenerator as RefGen

    from multimodalvc_tpu.nn.hifigan import (
        HifiGanConfig,
        HifiGanGenerator,
        import_torch_generator,
    )

    ref = RefGen(in_channels=32, **_small_gen_kwargs()).eval()
    _randomize_(ref, seed=8)

    b, t = 1, 12
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((b, 32, t)).astype(np.float32)
    with torch.no_grad():
        ref_wav = ref(torch.from_numpy(mel)).numpy()  # [B, 1, T*40]

    cfg = HifiGanConfig(
        in_channels=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilations=((1, 3, 5), (1, 3, 5)),
        upsample_factors=(10, 4),
        upsample_kernel_sizes=(20, 8),
        upsample_initial_channel=64,
    )
    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = import_torch_generator(state, cfg)
    ours = HifiGanGenerator(cfg).apply(variables, mel.transpose(0, 2, 1))
    _close(
        np.asarray(ours)[..., 0],
        ref_wav[:, 0, :],
        rtol=5e-4,
        atol=5e-4,
        what="hifigan generator",
    )


@pytest.mark.slow
def test_hifigan_discriminator_parity_vs_vendored():
    """Our MPD+MSD vs custom_hifigan/hifigan/discriminator.py:14-263 through
    import_torch_discriminator (incl. spectral-norm first MSD scale)."""
    from hifigan.discriminator import HifiganDiscriminator as RefDisc

    from multimodalvc_tpu.nn.hifigan import (
        HifiGanDiscriminator,
        import_torch_discriminator,
    )

    ref = RefDisc().eval()
    _randomize_(ref, seed=10)

    t = 4000
    rng = np.random.default_rng(11)
    wav = rng.standard_normal((1, 1, t)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_scores, ref_feats = ref(torch.from_numpy(wav))

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = import_torch_discriminator(state)
    ours_scores, ours_feats = HifiGanDiscriminator().apply(
        variables, wav.transpose(0, 2, 1)
    )
    assert len(ours_scores) == len(ref_scores) == 8  # 5 MPD + 3 MSD
    for i, (o, r) in enumerate(zip(ours_scores, ref_scores)):
        _close(
            np.asarray(o).reshape(-1),
            r.numpy().reshape(-1),
            rtol=1e-3,
            atol=1e-3,
            what=f"disc score {i}",
        )


# ---------------------------------------------------------------------------
# Whisper mel front end vs the transformers feature extractor the reference
# calls (src/dataset.py:185,310 via WhisperProcessor)
# ---------------------------------------------------------------------------


def test_whisper_mel_parity_vs_feature_extractor():
    from transformers import WhisperFeatureExtractor

    from multimodalvc_tpu.ops import pad_to_whisper_chunk, whisper_log_mel

    fe = WhisperFeatureExtractor()  # library defaults == whisper-medium.en cfg
    rng = np.random.default_rng(12)
    wav = (rng.standard_normal(52341) * 0.1).astype(np.float32)
    ref_feats = fe(wav, sampling_rate=16000, return_tensors="np").input_features[0]
    ours = np.asarray(whisper_log_mel(pad_to_whisper_chunk(wav)))
    assert ours.shape == ref_feats.shape == (80, 3000)
    _close(ours, ref_feats, rtol=1e-4, atol=2e-4, what="whisper mel")


# ---------------------------------------------------------------------------
# AV-HuBERT trunk vs the ACTUAL vendored avhubert/hubert.py (via the
# tests-only omegaconf/hydra shim in tests/_vendored_fairseq.py)
# ---------------------------------------------------------------------------


def _build_vendored_avhubert(seed=13):
    """Tiny-but-real vendored AVHubertModel (full 512-d ResNet front end,
    2-layer pre-LN transformer), randomized, in eval mode."""
    from tests._vendored_fairseq import load_vendored_avhubert

    hub = load_vendored_avhubert()
    from avhubert.hubert_pretraining import AVHubertPretrainingConfig

    cfg = hub.AVHubertConfig(
        label_rate=25,
        input_modality="video",
        encoder_embed_dim=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_embed_dim=128,
        audio_feat_dim=104,
        layer_norm_first=True,  # the large recipe the product loads
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
    _randomize_(ref, seed=seed)
    return ref, cfg


@pytest.mark.slow
def test_avhubert_trunk_parity_vs_vendored():
    """extract_finetune activation parity: audio-only / video-only / AV
    fusion, unmasked and with vendored-input-masked sources, with ragged
    padding — against avhubert/hubert.py:694-744 through
    import_torch_avhubert.  Validates fusion order (audio first,
    hubert.py:713), pre-LN recipe, zero-filled missing modality, and
    fairseq padding semantics end-to-end."""
    import jax.numpy as jnp

    from multimodalvc_tpu.nn.avhubert import (
        AVHubertConfig as OurCfg,
        AVHubertModel as OurModel,
        import_torch_avhubert,
    )

    ref, cfg = _build_vendored_avhubert()

    b, t, hw, feat = 2, 6, 24, 104
    rng = np.random.default_rng(14)
    video_btHWc = rng.standard_normal((b, t, hw, hw, 1)).astype(np.float32)
    audio_btf = rng.standard_normal((b, t, feat)).astype(np.float32)
    lengths = np.asarray([t, 4], np.int32)
    # fairseq padding_mask: True = PAD
    pad = torch.zeros(b, t, dtype=torch.bool)
    for i in range(b):
        pad[i, lengths[i]:] = True

    # torch layouts: audio [B, F, T], video [B, C, T, H, W]
    t_audio = torch.from_numpy(audio_btf.transpose(0, 2, 1))
    t_video = torch.from_numpy(video_btHWc.transpose(0, 4, 1, 2, 3))

    ours_cfg = OurCfg(
        encoder_embed_dim=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_dim=128,
        audio_feat_dim=feat,
    )
    variables = import_torch_avhubert(
        {k: v.numpy() for k, v in ref.state_dict().items()}, ours_cfg
    )
    model = OurModel(ours_cfg)

    def ours(audio=None, video=None):
        out = model.apply(
            variables, audio=audio, video=video,
            lengths=jnp.asarray(lengths), train=False,
        )
        return np.asarray(out)

    cases = {
        "av": dict(audio=t_audio, video=t_video),
        "video_only": dict(audio=None, video=t_video),
        "audio_only": dict(audio=t_audio, video=None),
    }
    for name, src in cases.items():
        with torch.no_grad():
            ref_x, _ = ref.extract_finetune(src, padding_mask=pad, mask=False)
        got = ours(
            audio=audio_btf if src["audio"] is not None else None,
            video=video_btHWc if src["video"] is not None else None,
        )
        for i in range(b):
            _close(
                got[i, : lengths[i]],
                ref_x.numpy()[i, : lengths[i]],
                rtol=2e-4, atol=2e-4,
                what=f"avhubert trunk [{name}] row {i}",
            )

    # masked-input distribution through the trunk: produce masked sources
    # with the VENDORED apply_input_mask (seeded), then run both models on
    # the identical masked arrays (the reference's fine-tune-time input
    # masking, hubert.py:442-472; span randomness itself is torch-internal
    # so both sides consume its output)
    torch.manual_seed(15)
    np.random.seed(15)
    ref.mask_prob_image, ref.mask_length_image = 0.6, 2
    ref.mask_prob_audio, ref.mask_length_audio = 0.6, 2
    mv, _ = ref.apply_input_mask(t_video.clone(), pad, target_list=None)
    ma, _ = ref.apply_input_mask(t_audio.clone(), pad, target_list=None)
    mv, ma = mv.detach(), ma.detach()
    with torch.no_grad():
        ref_x, _ = ref.extract_finetune(
            {"audio": ma, "video": mv}, padding_mask=pad, mask=False
        )
    got = ours(
        audio=ma.numpy().transpose(0, 2, 1),
        video=mv.numpy().transpose(0, 2, 3, 4, 1),
    )
    for i in range(b):
        _close(
            got[i, : lengths[i]],
            ref_x.numpy()[i, : lengths[i]],
            rtol=2e-4, atol=2e-4,
            what=f"avhubert trunk [masked] row {i}",
        )
