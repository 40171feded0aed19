"""Task layer: couples datasets, models and criterions for the CLI.

Reference: src/task.py:33-218 (MMS_LLaMA_TrainingTask) + fairseq's task
registry.  A task owns dataset construction per split, the trainer loss
function, the validation step, and (for AVSR) decode.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass, field, fields
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config.registry import register_task
from .data.dataset import AVSRDataset, AVSRDatasetConfig
from .models.avsr import AVSRConfig, AVSRSystem
from .models.speech import SpeechConfig, SpeechE2EModel, SpeechLLMModel, SpeechNoLLMModel
from .models.vocoder import VocoderConfig, VocoderModel
from .criterions.mel import MelL1Config, MelL1Criterion

logger = logging.getLogger(__name__)


def _trim_audio_feats(batch: Dict[str, np.ndarray], whisper_frames: int) -> Dict[str, np.ndarray]:
    """Cut the fixed 30 s whisper features down to the model's window."""
    af = batch.get("audio_feats")
    if af is not None and af.shape[-1] > 2 * whisper_frames:
        batch = dict(batch)
        batch["audio_feats"] = af[..., : 2 * whisper_frames]
    return batch


@dataclass
class AVSRTaskConfig:
    data: str = ""
    llm_path: Optional[str] = None
    noise_wav: Optional[str] = None
    noise_prob: float = 0.25
    noise_snr: Optional[float] = None
    modalities: tuple = ("video", "audio")
    max_video_frames: int = 500
    max_label_tokens: int = 96
    length_buckets: tuple = (100, 200, 300, 400, 500)
    image_aug: bool = True
    # > 0 pipelines the LLaMA trunk over the mesh "pipeline" axis with this
    # many microbatches (GPipe; see conf/mms-llama-pp.yaml)
    pipeline_microbatches: int = 0


@register_task("avsr_training", config=AVSRTaskConfig)
class AVSRTask:
    """LM-loss AVSR fine-tuning (reference task MMS_LLaMA_training)."""

    def __init__(self, cfg: AVSRTaskConfig, model_cfg: Optional[AVSRConfig] = None):
        self.cfg = cfg
        self.model_cfg = model_cfg or AVSRConfig()
        self.system = AVSRSystem(self.model_cfg)

    @classmethod
    def from_config(cls, cfg, model_cfg=None):
        return cls(cfg, model_cfg)

    def load_dataset(self, subset: str) -> AVSRDataset:
        c = self.cfg
        ds = AVSRDataset(
            AVSRDatasetConfig(
                manifest_dir=c.data,
                subset=subset,
                llm_path=c.llm_path,
                modalities=c.modalities,
                noise_wav=c.noise_wav,
                noise_prob=c.noise_prob if subset == "train" else (
                    c.noise_prob if c.noise_snr is not None else 0.0
                ),
                noise_snr=c.noise_snr,
                max_video_frames=c.max_video_frames,
                max_label_tokens=c.max_label_tokens,
                length_buckets=tuple(c.length_buckets),
                image_aug=c.image_aug,
                with_text_labels=True,
            )
        )
        # special-token ids follow the tokenizer (src/model.py:473 derives the
        # pad id from the tokenizer the same way)
        self.model_cfg.eos_token_id = ds.tokenizer.eos_token_id
        self.model_cfg.pad_token_id = ds.tokenizer.pad_token_id
        return ds

    def prepare_batch(
        self, batch: Dict[str, np.ndarray], train: bool = True
    ) -> Dict[str, np.ndarray]:
        batch = _trim_audio_feats(batch, self.model_cfg.whisper.max_frames)
        keys = (
            "video",
            "video_lengths",
            "audio_feats",
            "audio_lengths",
            "instruction",
            "labels",
            "label_lengths",
        )
        return {k: batch[k] for k in keys if k in batch}

    def init_variables(self, rng, sample_batch):
        return self.system.init(rng, self.prepare_batch(sample_batch))

    def make_loss_fn(self):
        # getattr: duck-typed task configs (e.g. the benchmark dummy task)
        # may predate the pipeline field
        if getattr(self.cfg, "pipeline_microbatches", 0) > 0:
            from .parallel.mesh import get_current_mesh

            mesh = get_current_mesh()
            if mesh is not None and mesh.shape.get("pipeline", 1) > 1:
                return self.system.make_pipeline_loss_fn(
                    mesh, self.cfg.pipeline_microbatches
                )
        return self.system.make_trainer_loss_fn()

    def frozen_patterns(self):
        return self.system.frozen_patterns()

    def valid_step_fn(self):
        module = self.system.module

        def valid_step(params, collections, batch):
            loss, aux = module.apply({"params": params, **collections}, batch, train=False)
            return {
                "loss": loss,
                "accuracy": aux["n_correct"] / jnp.maximum(aux["n_valid"], 1),
                "n_tokens": aux["n_valid"],
            }

        return valid_step

    def decode_to_text(
        self,
        variables,
        batch: Dict[str, np.ndarray],
        ids,
        dataset,
        generation_cfg,
        constraints_by_id=None,
    ):
        """Beam-decode one prepared batch to (hypotheses, references) text.

        Shared by eval (src/eval.py:195-262) and validation-time WER
        (src/criterion.py:100-134 decodes with beam search at every valid
        step so training can select the best checkpoint by WER).

        ``constraints_by_id`` maps manifest sample id -> list of constraint
        token lists for lexically-constrained decoding (fairseq-cli
        --constraints; built from generation.constraints_file by cli/eval.py).
        """
        tok = dataset.tokenizer
        gen_batch = {
            k: v for k, v in batch.items() if k not in ("labels", "label_lengths")
        }
        cons_kw = {}
        if constraints_by_id:
            batch_cons = [constraints_by_id.get(int(i), []) for i in ids]
            if any(batch_cons):  # all-unconstrained batches keep the fast path
                cons_kw = dict(
                    constraints=batch_cons,
                    constraints_mode=getattr(generation_cfg, "constraints", None)
                    or "unordered",
                )
        seqs, _ = self.system.generate(
            variables,
            gen_batch,
            num_beams=generation_cfg.beam,
            max_new_tokens=generation_cfg.max_len,
            length_penalty=generation_cfg.length_penalty,
            no_repeat_ngram_size=generation_cfg.no_repeat_ngram_size,
            ancestry_reorder=getattr(generation_cfg, "ancestry_decode", None),
            kv_quant=getattr(generation_cfg, "kv_cache_quant", None),
            encoder_microbatch=getattr(generation_cfg, "encoder_microbatch", 0),
            **cons_kw,
        )
        best = np.asarray(seqs[:, 0])
        hyps: List[str] = []
        refs: List[str] = []
        for row, sample_id in zip(best, ids):
            toks = []
            for t in row.tolist():
                if t == self.model_cfg.eos_token_id:
                    break
                toks.append(t)
            hyps.append(tok.decode(toks))
            refs.append(
                dataset.manifest.labels[int(sample_id)] if dataset.manifest.labels else ""
            )
        return hyps, refs


@dataclass
class SpeechTaskConfig(AVSRTaskConfig):
    variant: str = "nollm"  # llm | nollm | e2e
    max_mel_frames: int = 2400
    p_modality_av: float = 0.5
    p_modality_video_only: float = 0.25
    p_modality_audio_only: float = 0.25


@register_task("speech_training", config=SpeechTaskConfig)
class SpeechTask:
    """Mel-regression speech-head fine-tuning (MMS_LLaMA_Speech / NoLLM)."""

    def __init__(self, cfg: SpeechTaskConfig, model_cfg: Optional[SpeechConfig] = None):
        self.cfg = cfg
        self.model_cfg = model_cfg or SpeechConfig()
        if cfg.variant == "llm":
            self.module = SpeechLLMModel(self.model_cfg)
        elif cfg.variant == "nollm":
            self.model_cfg.modality_dropout = True
            self.module = SpeechNoLLMModel(self.model_cfg)
        else:
            raise ValueError(f"variant {cfg.variant} (e2e uses task 'e2e_gan_training')")
        self.criterion = MelL1Criterion(MelL1Config())
        self._mode_rng = np.random.default_rng(7)

    @classmethod
    def from_config(cls, cfg, model_cfg=None):
        return cls(cfg, model_cfg)

    def load_dataset(self, subset: str) -> AVSRDataset:
        c = self.cfg
        return AVSRDataset(
            AVSRDatasetConfig(
                manifest_dir=c.data,
                subset=subset,
                llm_path=c.llm_path,
                modalities=c.modalities,
                max_video_frames=c.max_video_frames,
                length_buckets=tuple(c.length_buckets),
                with_text_labels=c.variant == "llm",
                with_mel_targets=True,
                max_mel_frames=c.max_mel_frames,
            )
        )

    def prepare_batch(self, batch, train: bool = True):
        batch = _trim_audio_feats(dict(batch), self.model_cfg.whisper.max_frames)
        keys = (
            "video", "video_lengths", "audio_feats", "audio_lengths",
            "instruction", "target_mel", "target_mel_lengths",
        )
        out = {k: batch[k] for k in keys if k in batch}
        if self.cfg.variant == "llm" and "instruction" not in out:
            raise ValueError("llm variant needs instruction tokens")
        # batch-level modality dropout mode, TRAINING ONLY — the reference
        # samples under self.training and evals in 'av' mode
        # (src/modelSpeechNoLLM.py:312-322)
        if train:
            mode = self._mode_rng.choice(
                3,
                p=[self.cfg.p_modality_av, self.cfg.p_modality_video_only, self.cfg.p_modality_audio_only],
            )
            out["modality_mode"] = np.asarray(mode, np.int32)
        return out

    def init_variables(self, rng, sample_batch):
        # jitted for the same reason as AVSRSystem.init: eager flax init
        # interprets the forward op-by-op and dominates CLI startup
        init = jax.jit(lambda r, b: self.module.init(r, b, train=True))
        return init(rng, self.prepare_batch(sample_batch))

    def frozen_patterns(self):
        pats = [r"encoder/whisper/", r"encoder/avhubert/", r"encoder/sr_predictor/"]
        if self.cfg.variant == "llm":
            pats.append(r"^llama/")
        return pats

    def make_loss_fn(self):
        module, criterion = self.module, self.criterion

        def loss_fn(params, collections, batch, rng):
            variables = {"params": params, **(collections or {})}
            out, mutated = module.apply(
                variables,
                batch,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            loss, metrics = criterion(out, batch, train=True)
            new_colls = dict(collections or {})
            new_colls.update(mutated)
            return loss, (metrics, new_colls)

        return loss_fn

    def valid_step_fn(self):
        module, criterion = self.module, self.criterion

        def valid_step(params, collections, batch):
            out = module.apply({"params": params, **collections}, batch, train=False)
            _, metrics = criterion(out, batch, train=False)
            return metrics

        return valid_step


@dataclass
class VocoderTaskConfig:
    data: str = ""
    segment_length: int = 8320
    lr: float = 1e-4


@register_task("vocoder_training", config=VocoderTaskConfig)
class VocoderTask:
    """Standalone HiFi-GAN pretraining (scripts/trainGermanVocoder.py)."""

    def __init__(self, cfg: VocoderTaskConfig, model_cfg: Optional[VocoderConfig] = None):
        self.cfg = cfg
        self.model_cfg = model_cfg or VocoderConfig(lr=cfg.lr, segment_length=cfg.segment_length)
        self.model = VocoderModel(self.model_cfg)

    @classmethod
    def from_config(cls, cfg, model_cfg=None):
        return cls(cfg, model_cfg)

    def load_dataset(self, subset: str):
        from .data.dataset import AVSRDataset, AVSRDatasetConfig

        return AVSRDataset(
            AVSRDatasetConfig(
                manifest_dir=self.cfg.data,
                subset=subset,
                modalities=("audio",),
                with_text_labels=False,
                with_mel_targets=True,
                with_waveform=True,
                max_mel_frames=self.model_cfg.segment_length // 160,
            )
        )

    def prepare_batch(self, batch, train: bool = True):
        seg = self.model_cfg.segment_length
        n_mel = seg // 160
        return {
            "mel": batch["target_mel"][:, :n_mel],
            "wav": batch["waveform"][:, :seg],
        }


@dataclass
class E2EGanTaskConfig(SpeechTaskConfig):
    stage1_freeze: bool = True  # freeze the trunk encoders (stage-1 recipe,
    # src/modelSpeechNoLLM_E2E.py:144-159 freeze-by-prefix list)
    gen_lr: float = 2e-4
    disc_lr: float = 2e-4
    vocoder_initial_channels: int = 512
    vocoder_resblock_kernels: tuple = (3, 7, 11)
    # discriminator stack size (criterions/gan.py E2EGanConfig)
    disc_periods: tuple = (2, 3, 5, 7, 11)
    disc_scales: int = 3
    disc_channels_cap: int = 1024


@register_task("e2e_gan_training", config=E2EGanTaskConfig)
class E2EGanTask:
    """E2E waveform fine-tuning with the HiFi-GAN dual-optimizer loop
    (reference: scripts/fineTuneSpeechNoLLM_E2E.sh -> criterion e2e_gan_loss,
    src/criterionSpeechE2E.py:90-279)."""

    def __init__(self, cfg: E2EGanTaskConfig, model_cfg: Optional[SpeechConfig] = None):
        from .criterions.gan import E2EGanConfig, E2EGanTrainer

        from .nn.hifigan import HifiGanConfig

        self.cfg = cfg
        self.model_cfg = model_cfg or SpeechConfig()
        self.model_cfg.modality_dropout = True
        nk = len(cfg.vocoder_resblock_kernels)
        voc = HifiGanConfig(
            in_channels=self.model_cfg.head_dim,
            upsample_initial_channel=cfg.vocoder_initial_channels,
            resblock_kernel_sizes=tuple(cfg.vocoder_resblock_kernels),
            resblock_dilations=((1, 3, 5),) * nk,
        )
        self.model = SpeechE2EModel(self.model_cfg, voc)
        self._gan_cfg = E2EGanConfig(
            gen_lr=cfg.gen_lr, disc_lr=cfg.disc_lr,
            disc_periods=tuple(cfg.disc_periods), disc_scales=cfg.disc_scales,
            disc_channels_cap=cfg.disc_channels_cap,
        )
        self._trainer_cls = E2EGanTrainer
        self._mode_rng = np.random.default_rng(7)

    @classmethod
    def from_config(cls, cfg, model_cfg=None):
        return cls(cfg, model_cfg)

    def frozen_patterns(self) -> List[str]:
        if not self.cfg.stage1_freeze:
            return [r"trunk/encoder/whisper/", r"trunk/encoder/avhubert/",
                    r"trunk/encoder/sr_predictor/"]
        # stage 1: train only the vocoder generator + adapter
        return [r"^trunk/"]

    def make_trainer(self, rng, sample_batch):
        """Build the dual-optimizer GAN trainer with the stage's frozen mask."""
        from .runtime.trainer import trainable_mask

        trainer = self._trainer_cls(self._gan_cfg, self.model)
        state = trainer.init_state(rng, sample_batch)
        mask = trainable_mask(state.gen_params, self.frozen_patterns())
        trainer = self._trainer_cls(self._gan_cfg, self.model, frozen_mask=mask)
        state = trainer.init_state(rng, sample_batch)
        return trainer, state

    def load_dataset(self, subset: str) -> AVSRDataset:
        c = self.cfg
        return AVSRDataset(
            AVSRDatasetConfig(
                manifest_dir=c.data,
                subset=subset,
                modalities=c.modalities,
                max_video_frames=c.max_video_frames,
                length_buckets=tuple(c.length_buckets),
                with_text_labels=False,
                with_mel_targets=True,
                with_waveform=True,
                max_mel_frames=c.max_mel_frames,
            )
        )

    def prepare_batch(self, batch, train: bool = True):
        batch = _trim_audio_feats(dict(batch), self.model_cfg.whisper.max_frames)
        keys = (
            "video", "video_lengths", "audio_feats", "audio_lengths",
            "target_mel", "target_mel_lengths", "waveform",
        )
        out = {k: batch[k] for k in keys if k in batch}
        if train:
            mode = self._mode_rng.choice(
                3,
                p=[self.cfg.p_modality_av, self.cfg.p_modality_video_only,
                   self.cfg.p_modality_audio_only],
            )
            out["modality_mode"] = np.asarray(mode, np.int32)
        return out


@dataclass
class AVHubertPretrainTaskConfig:
    data: str = ""
    km_path: Optional[str] = None  # defaults to <data>/<subset>.km
    max_video_frames: int = 500
    image_crop_size: int = 88
    length_buckets: tuple = (100, 200, 300, 400, 500)
    loss_unmasked_weight: float = 0.0  # pred_nomask weighting (large_vox: 0)


@register_task("avhubert_pretraining", config=AVHubertPretrainTaskConfig)
class AVHubertPretrainTask:
    """AV-HuBERT masked pretraining on k-means cluster labels
    (reference: avhubert/hubert_pretraining.py + hubert.py forward; labels
    come from manifest_tools learn-kmeans/dump-labels)."""

    def __init__(self, cfg: AVHubertPretrainTaskConfig, model_cfg=None):
        from .models.avhubert_pretrain import (
            AVHubertPretrainConfig,
            AVHubertPretrainModel,
        )

        self.cfg = cfg
        self.model_cfg = model_cfg or AVHubertPretrainConfig()
        self.module = AVHubertPretrainModel(self.model_cfg)

    @classmethod
    def from_config(cls, cfg, model_cfg=None):
        return cls(cfg, model_cfg)

    def load_dataset(self, subset: str):
        from .data.dataset import PretrainDataset

        return PretrainDataset(
            manifest_dir=self.cfg.data,
            subset=subset,
            km_path=self.cfg.km_path,
            max_video_frames=self.cfg.max_video_frames,
            image_crop_size=self.cfg.image_crop_size,
            length_buckets=tuple(self.cfg.length_buckets),
        )

    def prepare_batch(self, batch, train: bool = True):
        return batch

    def frozen_patterns(self):
        return []

    def init_variables(self, rng, sample_batch):
        # jitted: see AVSRSystem.init
        def _init(rngs, audio, video, targets, lengths):
            return self.module.init(
                rngs, audio=audio, video=video, targets=targets,
                lengths=lengths, train=True,
            )

        return jax.jit(_init)(
            {"params": rng, "mask": rng},
            sample_batch["audio"],
            sample_batch["video"],
            sample_batch["targets"],
            sample_batch["lengths"],
        )

    def make_loss_fn(self):
        module, w_u = self.module, self.cfg.loss_unmasked_weight

        def loss_fn(params, collections, batch, rng):
            variables = {"params": params, **(collections or {})}
            out, mutated = module.apply(
                variables,
                audio=batch["audio"],
                video=batch["video"],
                targets=batch["targets"],
                lengths=batch["lengths"],
                train=True,
                rngs={"mask": rng},
                mutable=["batch_stats"],
            )
            loss = out["loss_masked"] + w_u * out["loss_unmasked"]
            metrics = {
                "loss_masked": out["loss_masked"],
                "acc_masked": out["acc_masked"],
            }
            new_colls = dict(collections or {})
            new_colls.update(mutated)
            return loss, (metrics, new_colls)

        return loss_fn

    def valid_step_fn(self):
        module = self.module

        def valid_step(params, collections, batch):
            out = module.apply(
                {"params": params, **collections},
                audio=batch["audio"],
                video=batch["video"],
                targets=batch["targets"],
                lengths=batch["lengths"],
                train=False,
            )
            # no masking at eval: loss over all valid frames
            return {"loss": out["loss_unmasked"], "accuracy": out["acc_masked"]}

        return valid_step
