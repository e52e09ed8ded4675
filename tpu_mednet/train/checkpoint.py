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
import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from tpu_mednet.train.state import TrainState

logger = logging.getLogger(__name__)

# Checkpoint format version, stored in the hparams side-car.  Bumped when a
# semantics change leaves param SHAPES intact but reinterprets the weights:
#   2: decoder upsample moved from flax-'SAME' ConvTranspose padding to the
#      torch-phase explicit (1, 2) padding (models/blocks.py DecoderStage)
#      — a format-1 checkpoint restores cleanly but upsamples spatially
#      shifted by one voxel.
CKPT_FORMAT = 2


# directories already warned about a missing format tag — predict restores
# hparams twice (restore_hparams, then the full restore), and the multi-line
# warning should fire once per checkpoint, not per read
_format_warned: set = set()


def check_ckpt_format(hparams: Optional[Dict], directory) -> None:
    """Warn on checkpoints predating the format tag; refuse newer ones."""
    if hparams is None:
        return
    v = hparams.get("ckpt_format")
    if v is None:
        if str(directory) in _format_warned:
            return
        _format_warned.add(str(directory))
        logger.warning(
            "checkpoint at %s carries no ckpt_format tag: it predates the "
            "torch-phase decoder-upsample change (format 2). If it was "
            "trained on the old 'SAME'-padded upsample, the restored "
            "decoder will be spatially shifted by one voxel.", directory,
        )
    elif int(v) > CKPT_FORMAT:
        raise ValueError(
            f"checkpoint at {directory} has format {v}, newer than this "
            f"build's {CKPT_FORMAT}; upgrade tpu-mednet to restore it"
        )


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
            # registering the handlers up front lets item_metadata() and
            # subset restores (restore_hparams) run without orbax's
            # 'Item ... could not be restored' warnings on every predict
            item_handlers={
                "state": ocp.StandardCheckpointHandler(),
                "hparams": ocp.JsonCheckpointHandler(),
            },
        )

    def save(self, step: int, state: TrainState,
             hparams: Optional[Dict[str, Any]] = None) -> None:
        args = {"state": ocp.args.StandardSave(state)}
        if hparams is not None:
            hp = _jsonable(hparams)
            hp.setdefault("ckpt_format", CKPT_FORMAT)
            args["hparams"] = ocp.args.JsonSave(hp)
        self._mgr.save(step, args=ocp.args.Composite(**args))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    @property
    def available_steps(self):
        """Sorted steps currently retained (max_to_keep newest)."""
        return sorted(self._mgr.all_steps())

    def _resolve_step(self, step: Optional[int]) -> int:
        if step is not None:
            steps = sorted(self._mgr.all_steps())
            if step not in steps:
                raise FileNotFoundError(
                    f"no checkpoint at step {step} in {self.directory} "
                    f"(available steps: {steps})"
                )
            return step
        step = self.latest_step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        return step

    def _items_at(self, step: int) -> set:
        try:
            return set(self._mgr.item_metadata(step).keys())
        except Exception:
            return {"state", "hparams"}

    def restore(self, state_template: TrainState,
                step: Optional[int] = None) -> Tuple[TrainState, Optional[Dict]]:
        """Restore (state, hparams) at ``step`` (default: latest)."""
        step = self._resolve_step(step)
        args = {"state": ocp.args.StandardRestore(state_template)}
        if "hparams" in self._items_at(step):
            args["hparams"] = ocp.args.JsonRestore()
        restored = self._mgr.restore(step, args=ocp.args.Composite(**args))
        hparams = restored.get("hparams")
        check_ckpt_format(hparams, self.directory)
        return restored["state"], hparams

    def restore_hparams(self, step: Optional[int] = None) -> Optional[Dict]:
        """Restore only the hparams side-car at ``step`` (default: latest).

        A cheap JSON-only read — no weights are touched, so no state
        template is needed.  Returns ``None`` when the checkpoint carries
        no hparams (the public replacement for reaching into orbax
        internals from ``cli/predict.py``).
        """
        step = self._resolve_step(step)
        if "hparams" not in self._items_at(step):
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(hparams=ocp.args.JsonRestore())
        )
        hparams = restored.get("hparams")
        check_ckpt_format(hparams, self.directory)
        return hparams

    def close(self) -> None:
        self._mgr.close()


def widen_template_from_hparams(state_template: TrainState,
                                hp: Optional[Dict]) -> TrainState:
    """Match a restore template's tree to what the checkpoint was trained with.

    Inference callers build their template with the default plain-Adam
    optimizer, but the on-disk ``opt_state`` tree depends on the training
    run's optimizer config (schedules, clipping, MultiSteps accumulation,
    inject_hyperparams for plateau) — orbax refuses a structural mismatch.
    Rebuilds ``opt_state`` from the hparams side-car's optimizer flags
    (legacy side-cars without them reproduce the historic plain-Adam tree)
    and widens ``ema_params`` for EMA-trained checkpoints.
    """
    from tpu_mednet.train.optim import OptimizerConfig

    hp = hp or {}
    cfg = OptimizerConfig.from_hparams(hp)
    if cfg.needs_total_steps() and not cfg.total_steps:
        # the horizon only shifts schedule VALUES, never the tree shape —
        # any positive stand-in yields the structure the checkpoint holds
        cfg = cfg.resolve_total_steps(cfg.accumulate_grad_batches)
    if cfg.signature() != OptimizerConfig().signature():
        state_template = state_template.replace(
            opt_state=cfg.build().init(state_template.params)
        )
    if float(hp.get("ema_decay") or 0.0) > 0.0 \
            and state_template.ema_params is None:
        # ema_params has the exact structure of params — widen the
        # template without needing the model
        state_template = state_template.replace(
            ema_params=state_template.params
        )
    return state_template


def load_for_inference(directory, state_template: TrainState,
                       step: Optional[int] = None,
                       use_ema: bool = True) -> Tuple[Dict[str, Any], Optional[Dict]]:
    """Load frozen variables + hparams for prediction.

    Returns ``(variables, hparams)`` where variables holds ``params`` (and
    ``batch_stats`` when present) — the functional analogue of
    ``load_from_checkpoint(...).freeze()`` (predict.py:46-50).

    When the checkpoint was trained with weight EMA (hparams
    ``ema_decay`` > 0) the template is widened to restore ``ema_params``
    and, with ``use_ema`` (default), the EMA weights are the ones
    returned — they are what EMA training deploys.  ``use_ema=False``
    selects the raw final params instead.
    """
    mgr = CheckpointManager(directory)
    try:
        hp = mgr.restore_hparams(step=step)
        state_template = widen_template_from_hparams(state_template, hp)
        state, hparams = mgr.restore(state_template, step=step)
    finally:
        mgr.close()
    params = state.params
    if use_ema and state.ema_params is not None:
        params = state.ema_params
        logger.info("using EMA weights from %s (ema_decay=%s)",
                    directory, (hp or {}).get("ema_decay"))
    variables = {"params": params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    return variables, hparams


def _jsonable(obj):
    """Best-effort conversion of an hparams namespace/dict to JSON types."""
    if hasattr(obj, "__dict__") and not isinstance(obj, dict):
        obj = vars(obj)
    return json.loads(json.dumps(obj, default=str))
