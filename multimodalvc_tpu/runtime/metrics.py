"""Metric aggregation: averaged meters with log-interval snapshots.

Slimmed-down equivalent of the reference's nested thread-local aggregators
(reference: fairseq/fairseq/logging/metrics.py, meters.py) — a flat named
meter set is enough because the JAX trainer is single-threaded per process
and derived metrics (ppl, wer) are computed at reduce time.
"""
from __future__ import annotations

import json
import logging
import math
import time
from collections import OrderedDict
from typing import Callable, Dict, Optional

logger = logging.getLogger(__name__)


class AverageMeter:
    __slots__ = ("sum", "count")

    def __init__(self):
        self.sum = 0.0
        self.count = 0.0

    def update(self, value: float, weight: float = 1.0):
        self.sum += float(value) * weight
        self.count += weight

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0


class SpeedMeter:
    def __init__(self):
        self.start = time.perf_counter()
        self.n = 0

    def update(self, n: int = 1):
        self.n += n

    @property
    def rate(self) -> float:
        dt = time.perf_counter() - self.start
        return self.n / dt if dt > 0 else 0.0


class MetricsAggregator:
    def __init__(self, derived: Optional[Dict[str, Callable[[Dict[str, float]], float]]] = None):
        self.meters: "OrderedDict[str, AverageMeter]" = OrderedDict()
        self.derived = derived or {}
        self.speed = SpeedMeter()

    def update(self, values: Dict[str, float], weight: float = 1.0):
        for k, v in values.items():
            try:
                fv = float(v)
            except (TypeError, ValueError):
                continue
            if math.isnan(fv):
                continue
            self.meters.setdefault(k, AverageMeter()).update(fv, weight)
        self.speed.update()

    def snapshot(self) -> Dict[str, float]:
        out = {k: m.avg for k, m in self.meters.items()}
        for name, fn in self.derived.items():
            try:
                out[name] = fn(out)
            except Exception:
                pass
        out["ups"] = self.speed.rate
        return out

    def reset(self):
        self.meters.clear()
        self.speed = SpeedMeter()


def format_stats(stats: Dict[str, float], step: int, prefix: str = "train") -> str:
    parts = [f"{prefix} step {step}"]
    for k, v in stats.items():
        parts.append(f"{k}={v:.4g}")
    return " | ".join(parts)


def log_stats(stats: Dict[str, float], step: int, prefix: str = "train", fmt: str = "simple"):
    if fmt == "json":
        logger.info(json.dumps({"step": step, "prefix": prefix, **{k: round(float(v), 6) for k, v in stats.items()}}))
    else:
        logger.info(format_stats(stats, step, prefix))


class TensorBoardSink:
    """TensorBoard scalar/audio/figure sink (reference analog:
    fairseq/fairseq/logging/progress_bar.py TensorboardProgressBarWrapper and
    the vocoder trainer's audio/spectrogram logging,
    scripts/trainGermanVocoder.py:541-575).  No-op if tensorboardX is
    unavailable."""

    def __init__(self, logdir: Optional[str]):
        self._writer = None
        if not logdir:
            return
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(logdir)
        except Exception as e:  # pragma: no cover
            logger.info("tensorboard sink unavailable (%s)", e)

    def scalars(self, stats: Dict[str, float], step: int, prefix: str = "train") -> None:
        if self._writer is None:
            return
        for k, v in stats.items():
            try:
                self._writer.add_scalar(f"{prefix}/{k}", float(v), step)
            except (TypeError, ValueError):
                continue

    def audio(self, tag: str, wav, step: int, sample_rate: int = 16000) -> None:
        if self._writer is not None:
            self._writer.add_audio(tag, wav.reshape(-1, 1), step, sample_rate=sample_rate)

    def image(self, tag: str, img_hwc, step: int) -> None:
        if self._writer is not None:
            self._writer.add_image(tag, img_hwc, step, dataformats="HWC")

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
