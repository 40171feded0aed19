"""Standalone HiFi-GAN vocoder training/inference (smallest end-to-end model).

Replaces the reference vocoder trainers (custom_hifigan/train.py and
scripts/trainGermanVocoder.py:355-622) with a single jit'd XLA program per
step: the discriminator update and the generator update — two optax states —
run back-to-back inside one compiled function, replacing the reference's
criterion-owned second optimizer hack (src/criterionSpeechE2E.py:101-122).
EMA tracking of the generator (trainGermanVocoder.py:50-73) is one more
pytree in the train state.

Loss recipe (trainGermanVocoder.py:485-622):
  disc:  LS-GAN on MPD+MSD with detached fake
  gen :  45 * L1(logmel(fake), logmel(real)) + feature_matching + adversarial
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config.registry import register_model
from ..nn import hifigan as hg
from ..ops.stft import hifigan_log_mel


@dataclass
class VocoderConfig:
    generator: hg.HifiGanConfig = field(default_factory=hg.HifiGanConfig)
    lr: float = 1e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    weight_decay: float = 1e-5
    lr_decay: float = 0.999  # per-epoch exponential decay
    steps_per_epoch: int = 1000  # granularity at which lr_decay is applied
    mel_weight: float = 45.0
    ema_decay: float = 0.999
    segment_length: int = 8320
    sample_rate: int = 16000
    # discriminator stack size (reference: MPD periods 2,3,5,7,11 + 3-scale
    # MSD at widths up to 1024); smaller values build a test-size stack
    disc_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    disc_scales: int = 3
    disc_channels_cap: int = 1024


class GanTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any
    spectral: Any  # spectral-norm power-iteration vectors (mutable)
    gen_opt: Any
    disc_opt: Any
    ema_params: Any


@register_model("hifigan_vocoder", config=VocoderConfig)
class VocoderModel:
    """Bundles generator/discriminator modules with their GAN train step."""

    def __init__(self, cfg: VocoderConfig):
        self.cfg = cfg
        self.generator = hg.HifiGanGenerator(cfg.generator)
        self.discriminator = hg.HifiGanDiscriminator(
            periods=tuple(cfg.disc_periods), n_scales=cfg.disc_scales,
            channels_cap=cfg.disc_channels_cap,
        )
        schedule = optax.exponential_decay(
            cfg.lr,
            transition_steps=cfg.steps_per_epoch,
            decay_rate=cfg.lr_decay,
            staircase=True,
        )
        self._opt = optax.adamw(
            schedule, b1=cfg.betas[0], b2=cfg.betas[1], weight_decay=cfg.weight_decay
        )

    @classmethod
    def from_config(cls, cfg: VocoderConfig):
        return cls(cfg)

    # -- state ---------------------------------------------------------------

    def init_state(self, rng: jax.Array, mel_frames: int = 52) -> GanTrainState:
        cfg = self.cfg
        mel = jnp.zeros((1, mel_frames, cfg.generator.in_channels))
        wav = jnp.zeros((1, cfg.segment_length, 1))
        g_rng, d_rng = jax.random.split(rng)
        gen_vars = self.generator.init(g_rng, mel)
        disc_vars = self.discriminator.init(d_rng, wav)
        gen_params = gen_vars["params"]
        disc_params = disc_vars["params"]
        return GanTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            disc_params=disc_params,
            spectral=disc_vars.get("spectral", {}),
            gen_opt=self._opt.init(gen_params),
            disc_opt=self._opt.init(disc_params),
            ema_params=gen_params,
        )

    # -- steps ---------------------------------------------------------------

    def train_step(
        self, state: GanTrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[GanTrainState, Dict[str, jnp.ndarray]]:
        """One GAN step. batch: mel [B,T,128] (natural-log), wav [B,T*160,1]."""
        cfg = self.cfg
        mel, wav = batch["mel"], batch["wav"]

        fake = self.generator.apply({"params": state.gen_params}, mel)
        fake_det = jax.lax.stop_gradient(fake)

        # ---- discriminator update (detached fake) --------------------------
        def disc_loss_fn(disc_params, spectral):
            (scores_real, _), new_vars = self.discriminator.apply(
                {"params": disc_params, "spectral": spectral},
                wav,
                update_sn=True,
                mutable=["spectral"],
            )
            (scores_fake, _), _ = self.discriminator.apply(
                {"params": disc_params, "spectral": new_vars["spectral"]},
                fake_det,
                mutable=["spectral"],
            )
            loss = hg.discriminator_loss(scores_real, scores_fake)
            return loss, new_vars["spectral"]

        (d_loss, new_spectral), d_grads = jax.value_and_grad(disc_loss_fn, has_aux=True)(
            state.disc_params, state.spectral
        )
        d_updates, disc_opt = self._opt.update(d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---- generator update (through the updated discriminator) ----------
        def gen_loss_fn(gen_params):
            fake_g = self.generator.apply({"params": gen_params}, mel)
            fake_mel = hifigan_log_mel(fake_g[..., 0], sr=cfg.sample_rate)
            real_mel = hifigan_log_mel(wav[..., 0], sr=cfg.sample_rate)
            loss_mel = jnp.mean(jnp.abs(fake_mel - real_mel))
            scores_fake, feats_fake = self.discriminator.apply(
                {"params": disc_params, "spectral": new_spectral}, fake_g
            )
            scores_real, feats_real = self.discriminator.apply(
                {"params": disc_params, "spectral": new_spectral}, wav
            )
            feats_real = jax.lax.stop_gradient(feats_real)
            loss_fm = hg.feature_loss(feats_real, feats_fake)
            loss_adv = hg.generator_adv_loss(scores_fake)
            total = cfg.mel_weight * loss_mel + loss_fm + loss_adv
            return total, {
                "loss_mel": loss_mel,
                "loss_fm": loss_fm,
                "loss_adv": loss_adv,
            }

        (g_loss, aux), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params
        )
        g_updates, gen_opt = self._opt.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        ema_params = jax.tree.map(
            lambda e, p: e * cfg.ema_decay + p * (1.0 - cfg.ema_decay),
            state.ema_params,
            gen_params,
        )

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            spectral=new_spectral,
            gen_opt=gen_opt,
            disc_opt=disc_opt,
            ema_params=ema_params,
        )
        metrics = {
            "loss_gen": g_loss,
            "loss_disc": d_loss,
            **aux,
        }
        return new_state, metrics

    def valid_step(self, state: GanTrainState, batch: Dict[str, jnp.ndarray]):
        """Validation mel-L1 with the EMA generator (trainGermanVocoder.py:556)."""
        mel, wav = batch["mel"], batch["wav"]
        fake = self.generator.apply({"params": state.ema_params}, mel)
        fake_mel = hifigan_log_mel(fake[..., 0], sr=self.cfg.sample_rate)
        real_mel = hifigan_log_mel(wav[..., 0], sr=self.cfg.sample_rate)
        return {"mel_l1": jnp.mean(jnp.abs(fake_mel - real_mel))}

    def generate(self, params: Any, mel: jnp.ndarray) -> jnp.ndarray:
        """mel [B, T, 128] -> waveform [B, T*160]."""
        return self.generator.apply({"params": params}, mel)[..., 0]

    # -- checkpoint interop ---------------------------------------------------

    def import_torch_checkpoint(self, path: str, use_ema: bool = True):
        """Load a reference vocoder .pt in any of its 3 layouts
        (src/modelSpeechNoLLM_E2E.py:118-142: raw state dict, {'generator':...},
        or trainer dicts with 'generator'/'ema_generator')."""
        from ..runtime.pt_loader import flatten_state_dict, load_pt

        raw = load_pt(path)
        state = None
        if isinstance(raw, dict):
            for key in (("ema_generator",) if use_ema else ()) + ("generator", "model"):
                if isinstance(raw.get(key), dict):
                    state = raw[key]
                    break
            if state is None:
                state = raw
        flat = flatten_state_dict(state)
        flat = {k.removeprefix("module."): v for k, v in flat.items()}
        return hg.import_torch_generator(flat, self.cfg.generator)
