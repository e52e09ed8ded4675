"""Optional Neptune experiment-tracking sink.

The reference logs hparams, tags, source files, scalars and MIP images to
Neptune (`/root/reference/examples/train_seg.py:74-79`;
`segmentation.py:82-91` ``log_image``).  The neptune client is not baked
into this image, so the sink is import-gated: when ``neptune`` is
installed and ``NEPTUNE_API_TOKEN`` is set, ``maybe_create_neptune_run``
returns a live adapter; otherwise ``None`` and the caller falls back to
TensorBoard/JSONL only.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence

logger = logging.getLogger(__name__)


class NeptuneSink:
    """Scalar/figure sink with the subset of the API the Trainer uses."""

    def __init__(self, run):
        self.run = run

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        for k, v in scalars.items():
            self.run[k].append(float(v), step=step)

    def log_figure(self, tag: str, figure, step: int) -> None:
        self.run[tag].append(figure, step=step)

    def close(self) -> None:
        self.run.stop()


def maybe_create_neptune_run(
    project: Optional[str],
    experiment_name: str,
    hparams: Optional[dict] = None,
    tags: Optional[Sequence[str]] = None,
    source_files: Optional[Sequence[str]] = None,
) -> Optional[NeptuneSink]:
    """Create a Neptune run when the client + token are available."""
    if not project or not os.environ.get("NEPTUNE_API_TOKEN"):
        return None
    try:
        import neptune  # gated: not installed in this image by default
    except ImportError:
        logger.warning("neptune_project=%s set but the neptune client is "
                       "not installed; skipping Neptune logging", project)
        return None
    run = neptune.init_run(
        project=project,
        name=experiment_name,
        tags=list(tags or [experiment_name]),
        source_files=list(source_files or []),
    )
    if hparams:
        run["parameters"] = {k: str(v) for k, v in hparams.items()}
    return NeptuneSink(run)
