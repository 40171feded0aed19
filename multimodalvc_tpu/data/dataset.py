"""AVSR/speech dataset: manifest-driven samples + static-shape collation.

Reference: src/dataset.py:140-627 (mms_llama_dataset) — video decode +
transforms, whisper features, noise augmentation, tokenized labels +
constant instruction, lazy mel targets, waveform targets, and a collater
building net_input.  This version collates to BUCKETED static shapes so the
jit'd step compiles once per bucket.
"""
from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from .audio import NoiseMixer, hifigan_mel_np, read_wav, whisper_features_np
from .batching import batch_by_size, bucket_for, pad_to
from .manifest import Manifest, load_manifest, resolve_path
from .tokenizer import INSTRUCTION_TEXT, load_tokenizer
from .video import load_video_frames, transform_video

logger = logging.getLogger(__name__)

IGNORE_INDEX = -100


@dataclass
class AVSRDatasetConfig:
    manifest_dir: str = ""
    subset: str = "train"
    llm_path: Optional[str] = None
    modalities: Sequence[str] = ("video", "audio")
    image_crop_size: int = 88
    image_mean: float = 0.421
    image_std: float = 0.165
    image_aug: bool = False
    noise_wav: Optional[str] = None
    noise_prob: float = 0.0
    noise_snr: Optional[float] = None  # fixed SNR for eval sweeps
    max_video_frames: int = 500
    min_video_frames: int = 5
    max_label_tokens: int = 96
    length_buckets: Sequence[int] = (100, 200, 300, 400, 500)
    # which targets to produce
    with_text_labels: bool = True
    with_mel_targets: bool = False
    with_waveform: bool = False
    max_mel_frames: int = 2400
    seed: int = 1


class AVSRDataset:
    def __init__(self, cfg: AVSRDatasetConfig):
        self.cfg = cfg
        tsv = os.path.join(cfg.manifest_dir, f"{cfg.subset}.tsv")
        wrd = os.path.join(cfg.manifest_dir, f"{cfg.subset}.wrd")
        self.manifest = load_manifest(
            tsv,
            max_keep_frames=cfg.max_video_frames,
            min_keep_frames=cfg.min_video_frames,
            label_path=wrd if (cfg.with_text_labels and os.path.exists(wrd)) else None,
        )
        self.tokenizer = load_tokenizer(cfg.llm_path)
        self.instruction = np.asarray(self.tokenizer.encode(INSTRUCTION_TEXT), np.int32)
        self.noise = NoiseMixer(cfg.noise_wav, seed=cfg.seed) if cfg.noise_wav else None
        self.rng = np.random.default_rng(cfg.seed)
        self.is_train = cfg.subset == "train"

    def __len__(self):
        return len(self.manifest)

    def sizes(self) -> List[int]:
        return self.manifest.sizes()

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        e = self.manifest.entries[index]
        out: Dict[str, np.ndarray] = {"id": np.asarray(index)}

        if "video" in cfg.modalities:
            frames = load_video_frames(resolve_path(self.manifest.root, e.video_path))
            out["video"] = transform_video(
                frames,
                crop_size=cfg.image_crop_size,
                mean=cfg.image_mean,
                std=cfg.image_std,
                train=self.is_train and cfg.image_aug,
                rng=self.rng,
            )
            out["video_length"] = np.asarray(out["video"].shape[0], np.int32)

        if "audio" in cfg.modalities:
            wav = read_wav(resolve_path(self.manifest.root, e.audio_path))
            mix = (
                self.is_train and self.noise is not None and self.rng.random() < cfg.noise_prob
            ) or (not self.is_train and self.noise is not None and cfg.noise_prob >= 1.0)
            if mix:
                wav = self.noise(wav, cfg.noise_snr)
            out["audio_length"] = np.asarray(len(wav), np.int32)
            out["audio_feats"] = whisper_features_np(wav)
            if cfg.with_waveform:
                out["waveform"] = wav.astype(np.float32)
            if cfg.with_mel_targets:
                mel_path = os.path.splitext(
                    resolve_path(self.manifest.root, e.audio_path)
                )[0] + "_mel_100hz_128bands.npy"
                if os.path.exists(mel_path):
                    out["target_mel"] = np.load(mel_path).astype(np.float32)
                else:  # compute on the fly (offline extractor equivalent)
                    out["target_mel"] = hifigan_mel_np(wav)

        if cfg.with_text_labels and self.manifest.labels is not None:
            ids = self.tokenizer.encode(self.manifest.labels[index]) + [
                self.tokenizer.eos_token_id
            ]
            out["labels"] = np.asarray(ids[: cfg.max_label_tokens], np.int32)
        out["speech_rate"] = np.asarray(e.speech_rate, np.float32)
        return out

    # -- batching -------------------------------------------------------------

    def batches(
        self,
        max_tokens: Optional[int] = 1000,
        batch_size: Optional[int] = None,
        required_multiple: int = 1,
        epoch: int = 0,
    ) -> List[np.ndarray]:
        return batch_by_size(
            self.sizes(),
            max_tokens=max_tokens,
            batch_size=batch_size,
            buckets=self.cfg.length_buckets,
            required_multiple=required_multiple,
            shuffle_seed=(self.cfg.seed + epoch) if self.is_train else None,
        )

    def collate(self, samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        """Pad to the batch's BUCKET length (static shapes per bucket)."""
        cfg = self.cfg
        batch: Dict[str, np.ndarray] = {}
        b = len(samples)
        if "video" in samples[0]:
            vid_lens = np.asarray([s["video_length"] for s in samples], np.int32)
            t_v = bucket_for(int(vid_lens.max()), cfg.length_buckets)
            batch["video"] = np.stack([pad_to(s["video"], t_v) for s in samples])
            batch["video_lengths"] = vid_lens
        if "audio_feats" in samples[0]:
            batch["audio_feats"] = np.stack([s["audio_feats"] for s in samples])
            batch["audio_lengths"] = np.asarray(
                [s["audio_length"] for s in samples], np.int32
            )
        if "labels" in samples[0]:
            lab_lens = np.asarray([len(s["labels"]) for s in samples], np.int32)
            t_l = cfg.max_label_tokens
            batch["labels"] = np.stack(
                [pad_to(s["labels"], t_l, value=0) for s in samples]
            )
            batch["label_lengths"] = lab_lens
            batch["instruction"] = np.tile(self.instruction[None], (b, 1))
        if "target_mel" in samples[0]:
            mel_lens = np.asarray([s["target_mel"].shape[0] for s in samples], np.int32)
            batch["target_mel"] = np.stack(
                [pad_to(s["target_mel"], cfg.max_mel_frames) for s in samples]
            )
            batch["target_mel_lengths"] = np.minimum(mel_lens, cfg.max_mel_frames)
        if "waveform" in samples[0]:
            t_w = cfg.max_mel_frames * 160
            batch["waveform"] = np.stack(
                [pad_to(s["waveform"], t_w)[..., None] for s in samples]
            )
        batch["ids"] = np.asarray([int(s["id"]) for s in samples], np.int32)
        return batch


class PrefetchLoader:
    """Thread-pool sample loading + collation with a small prefetch queue
    (replaces the reference's DataLoader worker processes for this IO mix —
    numpy releases the GIL in the hot decode/matmul paths)."""

    def __init__(self, dataset: AVSRDataset, batches: List[np.ndarray], num_workers: int = 4,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batches = batches
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        import concurrent.futures as cf
        from collections import deque

        def load(idx_list):
            samples = [self.dataset[int(i)] for i in idx_list]
            return self.dataset.collate(samples)

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            pending = deque()
            it = iter(self.batches)
            for _ in range(self.prefetch):
                try:
                    pending.append(pool.submit(load, next(it)))
                except StopIteration:
                    break
            while pending:
                fut = pending.popleft()
                try:
                    pending.append(pool.submit(load, next(it)))
                except StopIteration:
                    pass
                yield fut.result()


class PretrainDataset:
    """AV-HuBERT masked-pretraining dataset: video + stacked logfbank +
    frame-level k-means labels from a .km file (one space-separated row per
    manifest clip; produced by manifest_tools dump-labels).

    Reference: avhubert/hubert_dataset.py (logfbank + 4-frame stacking to the
    25 Hz video rate, cluster-label targets from the clustering stage)."""

    def __init__(
        self,
        manifest_dir: str,
        subset: str,
        km_path: Optional[str] = None,
        label_rate: int = 100,  # k-means labels from MFCC run at 100 Hz
        max_video_frames: int = 500,
        image_crop_size: int = 88,
        length_buckets: Sequence[int] = (100, 200, 300, 400, 500),
        seed: int = 1,
    ):
        from .audio import stacked_logfbank_np

        self._fbank = stacked_logfbank_np
        tsv = os.path.join(manifest_dir, f"{subset}.tsv")
        self.manifest = load_manifest(tsv, max_keep_frames=max_video_frames)
        km = km_path or os.path.join(manifest_dir, f"{subset}.km")
        with open(km) as f:
            rows = f.read().splitlines()
        decim = max(label_rate // 25, 1)  # decimate to the 25 Hz frame rate
        self.labels = [np.asarray(r.split(), np.int32)[::decim] for r in rows]
        if len(self.labels) < len(self.manifest.entries):
            raise ValueError(
                f"{km}: {len(self.labels)} label rows < {len(self.manifest.entries)} clips"
            )
        self.crop = image_crop_size
        self.buckets = tuple(length_buckets)
        self.seed = seed
        self.is_train = subset == "train"

    def __len__(self):
        return len(self.manifest.entries)

    def sizes(self):
        return self.manifest.sizes()

    def batches(self, max_tokens=1000, batch_size=None, required_multiple=1, epoch=0):
        return batch_by_size(
            self.sizes(),
            max_tokens=max_tokens,
            batch_size=batch_size,
            buckets=self.buckets,
            required_multiple=required_multiple,
            shuffle_seed=(self.seed + epoch) if self.is_train else None,
        )

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        e = self.manifest.entries[index]
        root = self.manifest.root
        vp = e.video_path if os.path.isabs(e.video_path) else os.path.join(root, e.video_path)
        ap = e.audio_path if os.path.isabs(e.audio_path) else os.path.join(root, e.audio_path)
        video = transform_video(
            load_video_frames(vp), crop_size=self.crop, train=self.is_train
        )
        audio = self._fbank(read_wav(ap))
        t = min(len(video), len(audio), len(self.labels[index]))
        return {
            "video": video[:t],
            "audio": audio[:t],
            "targets": self.labels[index][:t],
            "length": np.asarray(t, np.int32),
        }

    def collate(self, samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        t_max = bucket_for(max(int(s["length"]) for s in samples), self.buckets)
        return {
            "video": np.stack([pad_to(s["video"], t_max) for s in samples]),
            "audio": np.stack([pad_to(s["audio"], t_max) for s in samples]),
            "targets": np.stack(
                [pad_to(s["targets"], t_max) for s in samples]
            ).astype(np.int32),
            "lengths": np.asarray([s["length"] for s in samples], np.int32),
        }
