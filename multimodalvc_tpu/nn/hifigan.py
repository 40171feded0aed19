"""HiFi-GAN vocoder: generator, MPD/MSD discriminators, GAN losses.

TPU re-design of the reference vocoder package (reference:
custom_hifigan/hifigan/generator.py:14-213, discriminator.py:14-263):
 * data flows [B, T, C] (NWC) so every conv lands on the MXU without
   layout transposes;
 * weight norm is an explicit (v, g) reparameterization (see wn_conv.py)
   — functionally identical to torch, foldable for inference;
 * the 160x upsampling chain (10*4*2*2, kernels 20/8/4/4) and the
   3-kernel MRF residual stacks match the reference hyperparameters so the
   published vocoder checkpoints load.

``import_torch_generator``/``import_torch_discriminator`` map reference
state dicts onto these modules (tested bit-exact against torch in
tests/test_hifigan.py).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .wn_conv import SNConv1d, WNConv1d, WNConv2d, WNConvTranspose1d, avg_pool_1d

LRELU_SLOPE = 0.1


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=LRELU_SLOPE)


@dataclass
class HifiGanConfig:
    in_channels: int = 128
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_factors: Tuple[int, ...] = (10, 4, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (20, 8, 4, 4)
    upsample_initial_channel: int = 512
    sample_rate: int = 16000
    # unit-LUT mode (HuBERT discrete units -> embedding); None = mel input
    unit_nums: Optional[int] = None


def _get_padding(k: int, d: int) -> int:
    return (k * d - d) // 2


class ResBlock(nn.Module):
    """MRF residual block: two dilated+plain conv pairs per dilation.

    ``frame_mask`` ([B, T, 1] bool) supports static padded buffers: every
    conv input is zeroed at padded frames so the kernels see exactly the
    structural zero padding torch sees on an exact-length tensor — without
    it, conv biases recolor the pad frames and each k>1 conv leaks them
    into the valid tail.
    """

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, frame_mask=None):
        def mask(h):
            return h if frame_mask is None else h * frame_mask.astype(h.dtype)

        for i, d in enumerate(self.dilations):
            h = mask(leaky_relu(x))
            h = WNConv1d(
                self.channels,
                self.kernel_size,
                padding=_get_padding(self.kernel_size, d),
                dilation=d,
                dtype=self.dtype,
                name=f"convs1_{i}",
            )(h)
            h = mask(leaky_relu(h))
            h = WNConv1d(
                self.channels,
                self.kernel_size,
                padding=_get_padding(self.kernel_size, 1),
                dtype=self.dtype,
                name=f"convs2_{i}",
            )(h)
            x = x + h
        return x


class HifiGanGenerator(nn.Module):
    """Mel [B, T, n_mels] (or units [B, T] int) -> waveform [B, T*160]."""

    config: HifiGanConfig = field(default_factory=HifiGanConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """``lengths`` ([B] valid input frames) makes a static padded buffer
        produce bit-parity with per-row exact-length runs: every conv input
        (here and in the ResBlocks) is zeroed beyond the valid frames, which
        is exactly the structural zero padding torch applies to an
        unpadded tensor.  None = whole buffer valid (zero overhead)."""
        cfg = self.config
        if cfg.unit_nums is not None and jnp.issubdtype(x.dtype, jnp.integer):
            lut = self.param(
                "lut",
                nn.initializers.normal(1.0),
                (cfg.unit_nums + 1, cfg.in_channels),
            )
            x = lut[x]

        cur_len = lengths

        def mask_of(h):
            if cur_len is None:
                return None
            return jnp.arange(h.shape[1])[None, :, None] < cur_len[:, None, None]

        def mask(h):
            m = mask_of(h)
            return h if m is None else h * m.astype(h.dtype)

        x = WNConv1d(
            cfg.upsample_initial_channel, 7, padding=3, dtype=self.dtype, name="conv_pre"
        )(mask(x))
        n_kernels = len(cfg.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(cfg.upsample_factors, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = mask(leaky_relu(x))
            x = WNConvTranspose1d(
                ch, k, stride=u, padding=(k - u) // 2, dtype=self.dtype, name=f"ups_{i}"
            )(x)
            cur_len = None if cur_len is None else cur_len * u
            fm = mask_of(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)
            ):
                z = ResBlock(ch, rk, rd, dtype=self.dtype, name=f"resblocks_{i * n_kernels + j}")(
                    x, frame_mask=fm
                )
                acc = z if acc is None else acc + z
            x = acc / n_kernels
        # reference uses the default slope 0.01 here, not LRELU_SLOPE
        # (custom_hifigan/hifigan/generator.py:109)
        x = mask(nn.leaky_relu(x, negative_slope=0.01))
        x = WNConv1d(1, 7, padding=3, dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x)


class PeriodDiscriminator(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    channels_cap: int = 1024  # test-size cap; 1024 = reference widths
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: [B, T, 1] -> (score [B, N], feature list)."""
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        # [B, T/p, p, C] — height = time/period, width = period (torch view)
        x = x.reshape(b, t // self.period, self.period, c)
        feats = []
        chans = tuple(min(c, self.channels_cap) for c in (32, 128, 512, 1024))
        pad = _get_padding(5, 1)
        for i, ch in enumerate(chans):
            x = WNConv2d(
                ch,
                (self.kernel_size, 1),
                stride=(self.stride, 1),
                padding=(pad, 0),
                dtype=self.dtype,
                name=f"convs_{i}",
            )(x)
            x = leaky_relu(x)
            feats.append(x)
        x = WNConv2d(
            min(1024, self.channels_cap), (self.kernel_size, 1), padding=(2, 0),
            dtype=self.dtype, name="convs_4",
        )(x)
        x = leaky_relu(x)
        feats.append(x)
        x = WNConv2d(1, (3, 1), padding=(1, 0), dtype=self.dtype, name="conv_post")(x)
        feats.append(x)
        return x.reshape(b, -1), feats


class ScaleDiscriminator(nn.Module):
    use_spectral_norm: bool = False
    channels_cap: int = 1024  # test-size cap; 1024 = reference widths
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_sn: bool = False):
        """x: [B, T, 1] -> (score, feature list)."""
        specs = [
            dict(features=128, kernel_size=15, stride=1, padding=7, groups=1),
            dict(features=128, kernel_size=41, stride=2, padding=20, groups=4),
            dict(features=256, kernel_size=41, stride=2, padding=20, groups=16),
            dict(features=512, kernel_size=41, stride=4, padding=20, groups=16),
            dict(features=1024, kernel_size=41, stride=4, padding=20, groups=16),
            dict(features=1024, kernel_size=41, stride=1, padding=20, groups=16),
            dict(features=1024, kernel_size=5, stride=1, padding=2, groups=1),
        ]
        cap = self.channels_cap
        specs = [
            {**sp, "features": min(sp["features"], cap),
             "groups": min(sp["groups"], min(sp["features"], cap))}
            for sp in specs
        ]
        feats = []
        for i, s in enumerate(specs):
            if self.use_spectral_norm:
                x = SNConv1d(dtype=self.dtype, name=f"convs_{i}", **s)(x, update_sn=update_sn)
            else:
                x = WNConv1d(dtype=self.dtype, name=f"convs_{i}", **s)(x)
            x = leaky_relu(x)
            feats.append(x)
        post = dict(features=1, kernel_size=3, stride=1, padding=1, groups=1)
        if self.use_spectral_norm:
            x = SNConv1d(dtype=self.dtype, name="conv_post", **post)(x, update_sn=update_sn)
        else:
            x = WNConv1d(dtype=self.dtype, name="conv_post", **post)(x)
        feats.append(x)
        return x.reshape(x.shape[0], -1), feats


class HifiGanDiscriminator(nn.Module):
    """MPD (periods 2,3,5,7,11) + MSD (3 scales, avg-pooled)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    n_scales: int = 3
    channels_cap: int = 1024  # reference widths; lower = test-size stack
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_sn: bool = False):
        scores, feats = [], []
        for i, p in enumerate(self.periods):
            s, f = PeriodDiscriminator(
                p, channels_cap=self.channels_cap, dtype=self.dtype, name=f"mpd_{i}"
            )(x)
            scores.append(s)
            feats.append(f)
        h = x
        for i in range(self.n_scales):
            if i != 0:
                h = avg_pool_1d(h, 4, 2, 2)
            s, f = ScaleDiscriminator(
                use_spectral_norm=(i == 0), channels_cap=self.channels_cap,
                dtype=self.dtype, name=f"msd_{i}"
            )(h, update_sn=update_sn)
            scores.append(s)
            feats.append(f)
        return scores, feats


# ---------------------------------------------------------------------------
# GAN losses (LS-GAN; reference: custom_hifigan/hifigan/discriminator.py:231-263)
# ---------------------------------------------------------------------------


def feature_loss(feats_real, feats_fake) -> jnp.ndarray:
    loss = 0.0
    for fr, ff in zip(feats_real, feats_fake):
        for r, f in zip(fr, ff):
            loss += jnp.mean(jnp.abs(r - f))
    return loss * 2.0


def discriminator_loss(scores_real, scores_fake):
    loss = 0.0
    for r, f in zip(scores_real, scores_fake):
        loss += jnp.mean((1.0 - r) ** 2) + jnp.mean(f**2)
    return loss


def generator_adv_loss(scores_fake) -> jnp.ndarray:
    loss = 0.0
    for f in scores_fake:
        loss += jnp.mean((1.0 - f) ** 2)
    return loss


# ---------------------------------------------------------------------------
# Torch checkpoint import
# ---------------------------------------------------------------------------


def _t(x: np.ndarray, *axes) -> jnp.ndarray:
    return jnp.asarray(np.ascontiguousarray(np.transpose(x, axes)))


def import_torch_generator(state: Dict[str, np.ndarray], cfg: Optional[HifiGanConfig] = None):
    """Map reference generator keys (generator.py:56-85) to our param tree.

    torch conv1d weight_v [O,I,K] -> v [K,I,O]; convT weight_v [I,O,K] ->
    v [K,O,I]; weight_g squeezes to 1-D.
    """
    cfg = cfg or HifiGanConfig()
    params: Dict[str, dict] = {}

    def conv1d(dst: str, src: str):
        params[dst] = {
            "v": _t(state[f"{src}.weight_v"], 2, 1, 0),
            "g": jnp.asarray(state[f"{src}.weight_g"].reshape(-1)),
            "bias": jnp.asarray(state[f"{src}.bias"]),
        }

    def convT(dst: str, src: str):
        params[dst] = {
            "v": _t(state[f"{src}.weight_v"], 2, 1, 0),
            "g": jnp.asarray(state[f"{src}.weight_g"].reshape(-1)),
            "bias": jnp.asarray(state[f"{src}.bias"]),
        }

    if cfg.unit_nums is not None and "lut.weight" in state:
        params["lut"] = jnp.asarray(state["lut.weight"])
    conv1d("conv_pre", "conv_pre")
    n_up = len(cfg.upsample_factors)
    n_k = len(cfg.resblock_kernel_sizes)
    for i in range(n_up):
        convT(f"ups_{i}", f"ups.{i}")
    for r in range(n_up * n_k):
        block: Dict[str, dict] = {}
        for j in range(len(cfg.resblock_dilations[r % n_k])):
            for which in ("convs1", "convs2"):
                sub = {
                    "v": _t(state[f"resblocks.{r}.{which}.{j}.weight_v"], 2, 1, 0),
                    "g": jnp.asarray(state[f"resblocks.{r}.{which}.{j}.weight_g"].reshape(-1)),
                    "bias": jnp.asarray(state[f"resblocks.{r}.{which}.{j}.bias"]),
                }
                block[f"{which}_{j}"] = sub
        params[f"resblocks_{r}"] = block
    conv1d("conv_post", "conv_post")
    return {"params": params}


def import_torch_discriminator(state: Dict[str, np.ndarray]):
    """Map reference HifiganDiscriminator (mpd.* / msd.*) keys."""
    params: Dict[str, dict] = {}
    spectral: Dict[str, dict] = {}

    def wn1d(src):
        return {
            "v": _t(state[f"{src}.weight_v"], 2, 1, 0),
            "g": jnp.asarray(state[f"{src}.weight_g"].reshape(-1)),
            "bias": jnp.asarray(state[f"{src}.bias"]),
        }

    def wn2d(src):
        return {
            "v": _t(state[f"{src}.weight_v"], 2, 3, 1, 0),
            "g": jnp.asarray(state[f"{src}.weight_g"].reshape(-1)),
            "bias": jnp.asarray(state[f"{src}.bias"]),
        }

    def sn1d(src):
        # torch spectral norm: weight_orig [O,I,K], u [O], v flat over (I,K).
        # Our kernel layout flattens (K,I), so permute the cached v vector.
        w = state[f"{src}.weight_orig"]
        o, i, k = w.shape
        v_cache = state[f"{src}.weight_v"].reshape(i, k).T.reshape(-1)
        return (
            {
                "v": _t(w, 2, 1, 0),
                "bias": jnp.asarray(state[f"{src}.bias"]),
            },
            {
                "u": jnp.asarray(state[f"{src}.weight_u"]),
                "v": jnp.asarray(np.ascontiguousarray(v_cache)),
            },
        )

    for i in range(5):
        sub = {}
        for c in range(5):
            sub[f"convs_{c}"] = wn2d(f"mpd.discriminators.{i}.convs.{c}")
        sub["conv_post"] = wn2d(f"mpd.discriminators.{i}.conv_post")
        params[f"mpd_{i}"] = sub
    for i in range(3):
        sub = {}
        sub_sn = {}
        for c in range(7):
            src = f"msd.discriminators.{i}.convs.{c}"
            if i == 0:
                p, s = sn1d(src)
                sub[f"convs_{c}"] = p
                sub_sn[f"convs_{c}"] = s
            else:
                sub[f"convs_{c}"] = wn1d(src)
        src = f"msd.discriminators.{i}.conv_post"
        if i == 0:
            p, s = sn1d(src)
            sub["conv_post"] = p
            sub_sn["conv_post"] = s
            spectral[f"msd_{i}"] = sub_sn
        else:
            sub["conv_post"] = wn1d(src)
        params[f"msd_{i}"] = sub
    return {"params": params, "spectral": spectral}
