"""Orbax checkpointing: auto-save, resume, load-for-inference.

TPU-native equivalent of the checkpoint/resume verbs the reference
delegates to pytorch-lightning (`train_seg.py:122-131` default
checkpointing + ``resume_from_checkpoint``; `predict.py:46-50`
``load_from_checkpoint`` + ``freeze`` — which relies on hparams having been
stored with the weights, `segmentation.py:33`).  Params, optimizer state,
step and the hparams bundle are saved together.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from tpu_mednet.train.state import TrainState


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager with an hparams side-car."""

    def __init__(self, directory, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState,
             hparams: Optional[Dict[str, Any]] = None) -> None:
        args = {"state": ocp.args.StandardSave(state)}
        if hparams is not None:
            args["hparams"] = ocp.args.JsonSave(_jsonable(hparams))
        self._mgr.save(step, args=ocp.args.Composite(**args))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState,
                step: Optional[int] = None) -> Tuple[TrainState, Optional[Dict]]:
        """Restore (state, hparams) at ``step`` (default: latest)."""
        step = step if step is not None else self.latest_step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        args = {"state": ocp.args.StandardRestore(state_template)}
        try:
            items = set(self._mgr.item_metadata(step).keys())
        except Exception:
            items = {"state", "hparams"}
        if "hparams" in items:
            args["hparams"] = ocp.args.JsonRestore()
        restored = self._mgr.restore(step, args=ocp.args.Composite(**args))
        return restored["state"], restored.get("hparams")

    def close(self) -> None:
        self._mgr.close()


def load_for_inference(directory, state_template: TrainState,
                       step: Optional[int] = None) -> Tuple[Dict[str, Any], Optional[Dict]]:
    """Load frozen variables + hparams for prediction.

    Returns ``(variables, hparams)`` where variables holds ``params`` (and
    ``batch_stats`` when present) — the functional analogue of
    ``load_from_checkpoint(...).freeze()`` (predict.py:46-50).
    """
    mgr = CheckpointManager(directory)
    try:
        state, hparams = mgr.restore(state_template, step=step)
    finally:
        mgr.close()
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    return variables, hparams


def _jsonable(obj):
    """Best-effort conversion of an hparams namespace/dict to JSON types."""
    if hasattr(obj, "__dict__") and not isinstance(obj, dict):
        obj = vars(obj)
    return json.loads(json.dumps(obj, default=str))
