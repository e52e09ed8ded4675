"""Metric sinks: JSONL (always) + TensorBoard (when available).

Replaces the reference's dual Neptune/TensorBoard wiring
(`/root/reference/examples/train_seg.py:74-80`) with a dependency-light
fan-out.  Scalar names match the reference exactly (``train_loss``,
``val_loss``, ``val_dice{c}``, ``val_class_loss``, ``val_regression_loss``)
so dashboards transfer.  A Neptune sink can be registered when the neptune
client is installed (it is not baked into this environment).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


class MetricsLogger:
    """Fan-out scalar/image logger."""

    def __init__(self, log_dir, use_tensorboard: bool = True, extra_sinks=()):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard and SummaryWriter is not None:
            self._tb = SummaryWriter(logdir=str(self.log_dir))
        # additional sinks with the same interface (e.g. NeptuneSink)
        self.extra_sinks = [s for s in extra_sinks if s is not None]

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        record = {"step": step, "time": time.time()}
        record.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
        for sink in self.extra_sinks:
            sink.log_scalars(step, scalars)

    def log_figure(self, tag: str, figure, step: int) -> None:
        """Log a matplotlib figure (MIP visualizations).

        The reference always renders ``log_samples`` MIPs into a live sink
        (`/root/reference/midasmednet/segmentation.py:100-101`).  When
        TensorBoard is unavailable the figure falls back to a PNG under
        ``<log_dir>/figures/<tag>_<step>.png`` so training-time
        observability never silently drops frames.
        """
        if self._tb is not None:
            self._tb.add_figure(tag, figure, step)
        else:
            fig_dir = self.log_dir / "figures"
            fig_dir.mkdir(parents=True, exist_ok=True)
            safe_tag = tag.replace("/", "_")
            figure.savefig(fig_dir / f"{safe_tag}_{step:06d}.png",
                           bbox_inches="tight")
        for sink in self.extra_sinks:
            sink.log_figure(tag, figure, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        for sink in self.extra_sinks:
            sink.close()
