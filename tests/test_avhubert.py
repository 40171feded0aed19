"""Parity tests for the video ResNet front end and AV-HuBERT assembly.

torch is the numerical oracle: standard Conv3d/BatchNorm/PReLU/ResNet blocks
are built inline, their state dicts imported through our mapping, outputs
compared.  (The real AV-HuBERT checkpoints use exactly these torch layers.)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from multimodalvc_tpu.nn.avhubert import (  # noqa: E402
    AVHubertConfig,
    AVHubertModel,
    import_torch_avhubert,
)
from multimodalvc_tpu.nn.layers import MultiHeadAttention, TransformerLayer  # noqa: E402
from multimodalvc_tpu.nn.resnet import ResEncoder  # noqa: E402


class TorchResEncoder(tnn.Module):
    """Standard lipreading front end (torchvision-style ResNet-18 + 3D stem)."""

    def __init__(self):
        super().__init__()
        self.frontend3D = tnn.Sequential(
            tnn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            tnn.BatchNorm3d(64),
            tnn.PReLU(num_parameters=64),
            tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
        )
        self.trunk = self._make_trunk()

    @staticmethod
    def _block(inp, planes, stride=1):
        class B(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(planes)
                self.relu1 = tnn.PReLU(planes)
                self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(planes)
                self.relu2 = tnn.PReLU(planes)
                self.downsample = None
                if stride != 1 or inp != planes:
                    self.downsample = tnn.Sequential(
                        tnn.Conv2d(inp, planes, 1, stride, bias=False), tnn.BatchNorm2d(planes)
                    )

            def forward(self, x):
                r = x if self.downsample is None else self.downsample(x)
                h = self.relu1(self.bn1(self.conv1(x)))
                h = self.bn2(self.conv2(h))
                return self.relu2(h + r)

        return B()

    def _make_trunk(self):
        layers = {}
        inp = 64
        for li, (planes, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            blocks = tnn.Sequential(
                self._block(inp, planes, stride), self._block(planes, planes, 1)
            )
            layers[f"layer{li + 1}"] = blocks
            inp = planes
        trunk = tnn.Module()
        for k, v in layers.items():
            trunk.add_module(k, v)
        return trunk

    def forward(self, x):  # x: [B, 1, T, H, W]
        x = self.frontend3D(x)
        b, c, t, h, w = x.shape
        x = x.transpose(1, 2).reshape(b * t, c, h, w)
        for li in range(1, 5):
            x = getattr(self.trunk, f"layer{li}")(x)
        x = x.mean(dim=(2, 3))
        return x.reshape(b, t, -1)


def _remap_torch_resnet_state(tstate):
    """TorchResEncoder state dict -> reference avhubert key names."""
    out = {}
    for k, v in tstate.items():
        k2 = k.replace("downsample.0", "downsample!0").replace("downsample.1", "downsample!1")
        if k2.startswith("trunk."):
            parts = k2.split(".")
            k2 = ".".join(parts)
        k2 = k2.replace("downsample!0", "downsample.0").replace("downsample!1", "downsample.1")
        out[f"feature_extractor_video.resnet.{k2}"] = v.numpy()
    return out


def test_resnet_frontend_matches_torch(rng):
    tmod = TorchResEncoder()
    tmod.eval()
    video = rng.standard_normal((2, 1, 5, 40, 40)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(video)).numpy()  # [B, T, 512]

    full = _remap_torch_resnet_state(tmod.state_dict())
    import multimodalvc_tpu.nn.avhubert as avh

    # import the resnet subtree through the same helpers the full importer uses
    params, stats = {}, {}
    pre = "feature_extractor_video.resnet"
    params["frontend_conv"] = {
        "kernel": jnp.asarray(
            full[f"{pre}.frontend3D.0.weight"].transpose(3, 4, 2, 1, 0).reshape(7, 7, 5, -1)
        )
    }
    p, s = avh._bn(full, f"{pre}.frontend3D.1")
    params["frontend_bn"], stats["frontend_bn"] = p, s
    params["frontend_relu"] = {"alpha": jnp.asarray(full[f"{pre}.frontend3D.2.weight"])}
    trunk_p, trunk_s = {}, {}
    for li in range(1, 5):
        for b in range(2):
            src = f"{pre}.trunk.layer{li}.{b}"
            bp, bs = {}, {}
            for cn in ("conv1", "conv2"):
                bp[cn] = {"kernel": jnp.asarray(full[f"{src}.{cn}.weight"].transpose(2, 3, 1, 0))}
            for bn in ("bn1", "bn2"):
                p, s = avh._bn(full, f"{src}.{bn}")
                bp[bn], bs[bn] = p, s
            for rl in ("relu1", "relu2"):
                bp[rl] = {"alpha": jnp.asarray(full[f"{src}.{rl}.weight"])}
            if f"{src}.downsample.0.weight" in full:
                bp["downsample_conv"] = {
                    "kernel": jnp.asarray(full[f"{src}.downsample.0.weight"].transpose(2, 3, 1, 0))
                }
                p, s = avh._bn(full, f"{src}.downsample.1")
                bp["downsample_bn"], bs["downsample_bn"] = p, s
            trunk_p[f"layer{li}_{b}"] = bp
            trunk_s[f"layer{li}_{b}"] = bs
    params["trunk"] = trunk_p
    stats["trunk"] = trunk_s

    out = ResEncoder().apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(video.transpose(0, 2, 3, 4, 1)),  # NCTHW -> NTHWC
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_transformer_layer_matches_torch_mha(rng):
    """Pre-LN layer vs torch: x + MHA(LN(x)); x + FFN(LN(x))."""
    d, h = 32, 4
    tmha = tnn.MultiheadAttention(d, h, batch_first=True)
    tln1, tln2 = tnn.LayerNorm(d), tnn.LayerNorm(d)
    tfc1, tfc2 = tnn.Linear(d, 64), tnn.Linear(64, d)
    x = rng.standard_normal((2, 9, d)).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x)
        h1 = tln1(tx)
        attn, _ = tmha(h1, h1, h1, need_weights=False)
        tx = tx + attn
        tx = tx + tfc2(torch.nn.functional.gelu(tfc1(tln2(tx))))
        ref = tx.numpy()

    in_w = tmha.in_proj_weight.detach().numpy()
    in_b = tmha.in_proj_bias.detach().numpy()
    qw, kw, vw = np.split(in_w, 3, axis=0)
    qb, kb, vb = np.split(in_b, 3, axis=0)
    params = {
        "self_attn": {
            "q_proj": {"kernel": jnp.asarray(qw.T), "bias": jnp.asarray(qb)},
            "k_proj": {"kernel": jnp.asarray(kw.T), "bias": jnp.asarray(kb)},
            "v_proj": {"kernel": jnp.asarray(vw.T), "bias": jnp.asarray(vb)},
            "out_proj": {
                "kernel": jnp.asarray(tmha.out_proj.weight.detach().numpy().T),
                "bias": jnp.asarray(tmha.out_proj.bias.detach().numpy()),
            },
        },
        "self_attn_layer_norm": {
            "scale": jnp.asarray(tln1.weight.detach().numpy()),
            "bias": jnp.asarray(tln1.bias.detach().numpy()),
        },
        "final_layer_norm": {
            "scale": jnp.asarray(tln2.weight.detach().numpy()),
            "bias": jnp.asarray(tln2.bias.detach().numpy()),
        },
        "ffn": {
            "fc1": {
                "kernel": jnp.asarray(tfc1.weight.detach().numpy().T),
                "bias": jnp.asarray(tfc1.bias.detach().numpy()),
            },
            "fc2": {
                "kernel": jnp.asarray(tfc2.weight.detach().numpy().T),
                "bias": jnp.asarray(tfc2.bias.detach().numpy()),
            },
        },
    }
    out = TransformerLayer(num_heads=h, ffn_dim=64, layer_norm_first=True).apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_avhubert_video_only_and_masking(rng):
    cfg = AVHubertConfig.tiny()
    model = AVHubertModel(cfg)
    video = jnp.asarray(rng.standard_normal((2, 6, 24, 24, 1)).astype(np.float32))
    audio_init = jnp.zeros((2, 6, 104), np.float32)
    # init with both modalities so both projection branches exist (the real
    # checkpoint has both; the AVSR path then runs video-only)
    vs = model.init(jax.random.PRNGKey(0), audio=audio_init, video=video)
    out = model.apply(vs, video=video)
    assert out.shape == (2, 6, cfg.encoder_embed_dim)
    # audio-only path shares the same params
    audio = jnp.asarray(rng.standard_normal((2, 6, 104)).astype(np.float32))
    out_a = model.apply(vs, audio=audio)
    assert out_a.shape == (2, 6, cfg.encoder_embed_dim)
    # length masking: padded frames don't affect valid outputs
    lengths = jnp.asarray([6, 3])
    o1 = model.apply(vs, audio=audio, lengths=lengths)
    audio2 = audio.at[1, 3:].set(9.0)
    o2 = model.apply(vs, audio=audio2, lengths=lengths)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]), rtol=1e-4, atol=1e-5)
