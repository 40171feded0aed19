"""Throughput-benchmark dummy tasks — synthetic data, real models.

Reference: fairseq/fairseq/benchmark/dummy_{lm,mt,masked_lm}.py — tasks that
fabricate batches so training throughput can be measured without a corpus.
``dummy_avsr`` drives the full AVSR train step through the normal CLI:

    python -m multimodalvc_tpu.cli.train task.name=dummy_avsr \
        model.name=mms_llama_avsr optimization.max_update=50
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..config.registry import register_task
from ..models.avsr import AVSRConfig, AVSRSystem
from ..tasks import AVSRTask


@dataclass
class DummyAVSRTaskConfig:
    data: str = ""  # unused
    batch_size: int = 4
    video_frames: int = 100
    crop: int = 88
    label_tokens: int = 24
    n_batches: int = 50
    seed: int = 0


class _DummyDataset:
    """Duck-typed dataset: fabricated AVSR batches, no disk IO."""

    def __init__(self, cfg: DummyAVSRTaskConfig, model_cfg: AVSRConfig):
        self.cfg = cfg
        self.model_cfg = model_cfg
        rng = np.random.default_rng(cfg.seed)
        b, t_v = cfg.batch_size, cfg.video_frames
        mc = model_cfg
        self._batch = {
            "audio_feats": rng.standard_normal(
                (b, mc.whisper.n_mels, 2 * mc.whisper.max_frames)
            ).astype(np.float32),
            "video": rng.standard_normal((b, t_v, cfg.crop, cfg.crop, 1)).astype(np.float32),
            "video_lengths": np.full((b,), t_v, np.int32),
            "audio_lengths": np.full((b,), t_v * 640, np.int32),
            "instruction": rng.integers(1, 200, (b, 8)).astype(np.int32),
            "labels": rng.integers(1, min(mc.llama.vocab_size, 200), (b, cfg.label_tokens)).astype(
                np.int32
            ),
            "label_lengths": np.full((b,), cfg.label_tokens, np.int32),
        }

    def __len__(self):
        return self.cfg.n_batches * self.cfg.batch_size

    def batches(self, max_tokens=None, batch_size=None, required_multiple=1, epoch=0):
        b = self.cfg.batch_size
        return [np.arange(i * b, (i + 1) * b) for i in range(self.cfg.n_batches)]

    def __getitem__(self, index: int):
        return index

    def collate(self, samples):
        return dict(self._batch)


@register_task("dummy_avsr", config=DummyAVSRTaskConfig)
class DummyAVSRTask(AVSRTask):
    """AVSRTask over fabricated batches (throughput benchmarking)."""

    def __init__(self, cfg: DummyAVSRTaskConfig, model_cfg: Optional[AVSRConfig] = None):
        self.cfg = cfg
        self.model_cfg = model_cfg or AVSRConfig()
        self.system = AVSRSystem(self.model_cfg)

    @classmethod
    def from_config(cls, cfg, model_cfg=None):
        return cls(cfg, model_cfg)

    def load_dataset(self, subset: str):
        return _DummyDataset(self.cfg, self.model_cfg)

    def prepare_batch(self, batch):
        return batch
