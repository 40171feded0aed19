"""Parity tests for the HiFi-GAN stack against torch reference semantics.

torch (CPU) is used purely as a numerical oracle: we build standard torch
conv layers / a standard public HiFi-GAN generator topology, export their
state dicts, import them through our mapping, and require near-bit-exact
agreement.  This is the same contract the reference vocoder checkpoints
(custom_hifigan) rely on.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

from multimodalvc_tpu.nn import hifigan as hg  # noqa: E402
from multimodalvc_tpu.nn.wn_conv import (  # noqa: E402
    SNConv1d,
    WNConv1d,
    WNConv2d,
    WNConvTranspose1d,
    avg_pool_1d,
)


def t2n(t):
    return t.detach().numpy()


def test_wnconv1d_matches_torch(rng):
    tconv = weight_norm(tnn.Conv1d(8, 16, 7, stride=2, padding=3, dilation=1))
    x = rng.standard_normal((2, 8, 50)).astype(np.float32)
    ref = t2n(tconv(torch.from_numpy(x)))

    params = {
        "v": jnp.asarray(t2n(tconv.weight_v).transpose(2, 1, 0)),
        "g": jnp.asarray(t2n(tconv.weight_g).reshape(-1)),
        "bias": jnp.asarray(t2n(tconv.bias)),
    }
    mod = WNConv1d(16, 7, stride=2, padding=3)
    out = mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5)


def test_wnconv1d_grouped_matches_torch(rng):
    tconv = weight_norm(tnn.Conv1d(16, 32, 41, stride=2, padding=20, groups=4))
    x = rng.standard_normal((1, 16, 100)).astype(np.float32)
    ref = t2n(tconv(torch.from_numpy(x)))
    params = {
        "v": jnp.asarray(t2n(tconv.weight_v).transpose(2, 1, 0)),
        "g": jnp.asarray(t2n(tconv.weight_g).reshape(-1)),
        "bias": jnp.asarray(t2n(tconv.bias)),
    }
    out = WNConv1d(32, 41, stride=2, padding=20, groups=4).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 1))
    )
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5)


def test_wnconvtranspose1d_matches_torch(rng):
    # the 10x upsampling layer of the vocoder: k=20, s=10, p=5
    tconv = weight_norm(tnn.ConvTranspose1d(32, 16, 20, stride=10, padding=5))
    x = rng.standard_normal((2, 32, 25)).astype(np.float32)
    ref = t2n(tconv(torch.from_numpy(x)))
    params = {
        "v": jnp.asarray(t2n(tconv.weight_v).transpose(2, 1, 0)),
        "g": jnp.asarray(t2n(tconv.weight_g).reshape(-1)),
        "bias": jnp.asarray(t2n(tconv.bias)),
    }
    out = WNConvTranspose1d(16, 20, stride=10, padding=5).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 1))
    )
    assert out.shape == (2, 250, 16)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5)


def test_wnconv2d_matches_torch(rng):
    tconv = weight_norm(tnn.Conv2d(1, 32, (5, 1), (3, 1), padding=(2, 0)))
    x = rng.standard_normal((2, 1, 30, 11)).astype(np.float32)
    ref = t2n(tconv(torch.from_numpy(x)))
    params = {
        "v": jnp.asarray(t2n(tconv.weight_v).transpose(2, 3, 1, 0)),
        "g": jnp.asarray(t2n(tconv.weight_g).reshape(-1)),
        "bias": jnp.asarray(t2n(tconv.bias)),
    }
    out = WNConv2d(32, (5, 1), (3, 1), padding=(2, 0)).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_snconv1d_matches_torch(rng):
    tconv = tnn.utils.spectral_norm(tnn.Conv1d(4, 8, 15, padding=7))
    x = torch.from_numpy(rng.standard_normal((1, 4, 64)).astype(np.float32))
    tconv.eval()
    with torch.no_grad():
        ref = t2n(tconv(x))
    w = t2n(tconv.weight_orig)
    o, i, k = w.shape
    variables = {
        "params": {
            "v": jnp.asarray(w.transpose(2, 1, 0)),
            "bias": jnp.asarray(t2n(tconv.bias)),
        },
        "spectral": {
            "u": jnp.asarray(t2n(tconv.weight_u)),
            "v": jnp.asarray(np.ascontiguousarray(t2n(tconv.weight_v).reshape(i, k).T.reshape(-1))),
        },
    }
    out = SNConv1d(8, 15, padding=7).apply(variables, jnp.asarray(t2n(x).transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, rtol=1e-3, atol=1e-4)


def test_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 3, 41)).astype(np.float32)
    ref = t2n(tnn.AvgPool1d(4, 2, padding=2)(torch.from_numpy(x)))
    out = avg_pool_1d(jnp.asarray(x.transpose(0, 2, 1)), 4, 2, 2)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Full generator parity via a torch fixture with the standard public topology
# ---------------------------------------------------------------------------


class _TorchResBlock(tnn.Module):
    def __init__(self, ch, k, dil):
        super().__init__()
        pad = lambda d: (k * d - d) // 2
        self.convs1 = tnn.ModuleList(
            [weight_norm(tnn.Conv1d(ch, ch, k, 1, dilation=d, padding=pad(d))) for d in dil]
        )
        self.convs2 = tnn.ModuleList(
            [weight_norm(tnn.Conv1d(ch, ch, k, 1, padding=pad(1))) for _ in dil]
        )

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c2(tF.leaky_relu(c1(tF.leaky_relu(x, 0.1)), 0.1))
            x = xt + x
        return x


class _TorchGenerator(tnn.Module):
    """Standard HiFi-GAN v1 topology (public jik876/hifi-gan layout)."""

    def __init__(self, in_ch=128, ch0=64, ups=(10, 4), ks=(20, 8), rks=(3, 7), dil=(1, 3, 5)):
        super().__init__()
        self.num_kernels = len(rks)
        self.conv_pre = weight_norm(tnn.Conv1d(in_ch, ch0, 7, 1, padding=3))
        self.ups = tnn.ModuleList()
        self.resblocks = tnn.ModuleList()
        for i, (u, k) in enumerate(zip(ups, ks)):
            self.ups.append(
                weight_norm(
                    tnn.ConvTranspose1d(ch0 // (2**i), ch0 // (2 ** (i + 1)), k, u, (k - u) // 2)
                )
            )
        for i in range(len(ups)):
            ch = ch0 // (2 ** (i + 1))
            for rk in rks:
                self.resblocks.append(_TorchResBlock(ch, rk, dil))
        self.conv_post = weight_norm(tnn.Conv1d(ch, 1, 7, 1, padding=3))

    def forward(self, x):
        o = self.conv_pre(x)
        for i in range(len(self.ups)):
            o = self.ups[i](tF.leaky_relu(o, 0.1))
            z = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](o)
                z = r if z is None else z + r
            o = z / self.num_kernels
        return torch.tanh(self.conv_post(tF.leaky_relu(o)))


def test_generator_matches_torch(rng):
    cfg = hg.HifiGanConfig(
        in_channels=128,
        upsample_initial_channel=64,
        upsample_factors=(10, 4),
        upsample_kernel_sizes=(20, 8),
        resblock_kernel_sizes=(3, 7),
        resblock_dilations=((1, 3, 5), (1, 3, 5)),
    )
    tgen = _TorchGenerator()
    tgen.eval()
    state = {k: t2n(v) for k, v in tgen.state_dict().items()}
    variables = hg.import_torch_generator(state, cfg)

    mel = rng.standard_normal((2, 17, 128)).astype(np.float32)
    with torch.no_grad():
        ref = t2n(tgen(torch.from_numpy(mel.transpose(0, 2, 1))))
    out = hg.HifiGanGenerator(cfg).apply(variables, jnp.asarray(mel))
    assert out.shape == (2, 17 * 40, 1)
    np.testing.assert_allclose(
        np.asarray(out)[..., 0], ref[:, 0, :], rtol=1e-3, atol=1e-4
    )


@pytest.mark.slow
def test_discriminator_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 4000, 1)).astype(np.float32))
    disc = hg.HifiGanDiscriminator()
    variables = disc.init(jax.random.PRNGKey(0), x)
    scores, feats = disc.apply(variables, x)
    assert len(scores) == 8 and len(feats) == 8  # 5 MPD + 3 MSD
    assert all(s.ndim == 2 for s in scores)
    # GAN losses are finite and positive at init
    d = hg.discriminator_loss(scores, scores)
    g = hg.generator_adv_loss(scores)
    f = hg.feature_loss(feats, feats)
    assert np.isfinite(float(d)) and np.isfinite(float(g)) and float(f) == 0.0
