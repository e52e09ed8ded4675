"""Training loop: epochs, validation, checkpointing, observability.

TPU-native replacement for the pytorch-lightning ``Trainer`` runtime the
reference delegates to (`/root/reference/examples/train_seg.py:122-132`):
a plain loop around jit'd steps with

- the native (C++) batch pipeline when available (byte-identical to the
  numpy sampler; ``native_loader=False`` to disable),
- async host->device prefetch (double buffering),
- replicated params / batch-sharded (or dp x sp spatially-partitioned)
  data over a ``jax.sharding.Mesh``,
- orbax auto-save + resume (PL's default checkpointing equivalents),
- graceful-preemption checkpointing (``PreemptionGuard``),
- TensorBoard/JSONL scalars under the reference's metric names, and
- optional MIP sample visualization every ``log_interval`` val batches
  (segmentation.py:100-101).
"""

from __future__ import annotations

import logging
import signal
import threading
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from tpu_mednet.data.prefetch import device_prefetch
from tpu_mednet.ops.augment import AugmentConfig
from tpu_mednet.parallel.mesh import (
    SPACE_AXIS,
    make_mesh,
    replicated,
    train_batch_sharding,
)
from tpu_mednet.train.checkpoint import CheckpointManager
from tpu_mednet.train.optim import (
    OptimizerConfig,
    PlateauController,
    check_resume_optimizer,
    read_current_lr,
)
from tpu_mednet.train.state import TrainState, create_train_state, param_count
from tpu_mednet.train.step import make_eval_step, make_train_step
from tpu_mednet.utils.metrics_logging import MetricsLogger

logger = logging.getLogger(__name__)


def _check_resume_architecture(hp_prev: dict, config, resume) -> None:
    """Refuse a --resume whose CLI hparams build a different model.

    Compares the model-defining keys of the checkpoint's hparams side-car
    (in/out channels and the expanded per-level feature maps) against the
    model the Trainer just built from the CLI.  An int ``fmaps`` side-car
    value expands over the checkpoint model family's default 5 levels, a
    list is taken per-level — matching the factories' semantics."""
    from tpu_mednet.models.unet import create_feature_maps

    problems = []
    for key, ours in (("in_channels", config.in_channels),
                      ("out_channels", config.out_channels)):
        theirs = hp_prev.get(key)
        if theirs is not None and int(theirs) != int(ours):
            problems.append(f"{key}: checkpoint {theirs} vs CLI {ours}")
    fm = hp_prev.get("fmaps")
    if fm is not None:
        theirs = (create_feature_maps(int(fm), 5) if not isinstance(fm, (list, tuple))
                  else tuple(int(x) for x in fm))
        if theirs != tuple(config.feature_maps):
            problems.append(
                f"feature maps: checkpoint {theirs} vs CLI {tuple(config.feature_maps)}"
            )
    if problems:
        raise ValueError(
            f"--resume {resume}: the checkpoint was trained with a "
            f"different architecture ({'; '.join(problems)}). Pass matching "
            "--fmaps/--in_channels/--out_channels (per-level fmaps lists "
            "can be given via the -c YAML config)."
        )


class NonFiniteError(RuntimeError):
    """Raised when training hits NaN/Inf under ``nonfinite='terminate'``
    (or when an entire epoch's updates were skipped under 'skip').  The
    last checkpoint written before the raise holds only finite params —
    the in-step gate skipped every poisoned update."""


class PreemptionGuard:
    """Graceful-preemption handling for long training runs.

    TPU pods are routinely preempted (maintenance, spot reclamation) with a
    SIGTERM grace window; the reference has no recovery story beyond PL's
    default checkpointing (SURVEY §5.3).  Installed around ``Trainer.fit``:
    the FIRST SIGTERM/SIGINT only sets a flag — the loop finishes the
    in-flight step, saves a checkpoint and returns cleanly, so ``--resume``
    continues from the preempted step.  A SECOND signal raises
    ``KeyboardInterrupt`` (escape hatch for interactive use).

    No-op when not on the main thread (signal handlers are main-thread
    only — e.g. Trainer driven from a test worker).
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.triggered = False
        self._signals = signals
        self._old: Dict[int, object] = {}

    def _on_signal(self, signum, frame):
        if self.triggered:
            raise KeyboardInterrupt(f"second signal {signum} during shutdown")
        self.triggered = True
        logger.warning(
            "received signal %d: finishing the in-flight step, then "
            "checkpointing and exiting (send again to abort hard)", signum,
        )

    def __enter__(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for sig in self._signals:
                try:
                    self._old[sig] = signal.signal(sig, self._on_signal)
                except (ValueError, OSError):  # pragma: no cover
                    pass
        return self

    def __exit__(self, *exc) -> None:
        for sig, old in self._old.items():
            signal.signal(sig, old)
        self._old.clear()


class Trainer:
    """Runs a task over train/val patch samplers."""

    def __init__(
        self,
        task,
        train_sampler,
        val_sampler=None,
        batch_size: int = 4,
        max_epochs: int = 100,
        learning_rate: float = 1e-3,
        model_dir: Optional[str] = None,
        log_dir: Optional[str] = None,
        augment: Optional[AugmentConfig] = None,
        mesh=None,
        seed: int = 0,
        log_every: int = 10,
        checkpoint_every_epochs: int = 1,
        sample_visualizer: Optional[Callable] = None,
        log_interval: int = 5,
        hparams: Optional[dict] = None,
        profile_dir: Optional[str] = None,
        profile_steps: int = 5,
        metric_sinks=(),
        native_loader: Optional[bool] = None,
        monitor: str = "val_loss",
        save_best: bool = True,
        optim: Optional[OptimizerConfig] = None,
        check_val_every_n_epoch: int = 1,
        early_stop_patience: int = 0,
        early_stop_min_delta: float = 0.0,
        limit_train_batches: int = 0,
        limit_val_batches: int = 0,
        nonfinite: str = "off",
        track_grad_norm: bool = False,
        keep_checkpoints: int = 3,
    ):
        self.task = task
        # route host PatchSamplers through the native batch pipeline (fused
        # C++ crop/convert/transpose + prefetch thread) when it's available;
        # byte-identical batches, so this is purely a throughput knob.
        # native_loader: None = auto, False = force numpy, True = require.
        from tpu_mednet.data.native_loader import make_batch_source
        from tpu_mednet.data.patch_sampler import PatchSampler

        def route(s):
            if native_loader is not False and isinstance(s, PatchSampler):
                return make_batch_source(s, use_native=native_loader)
            return s

        self.train_sampler = route(train_sampler)
        self.val_sampler = route(val_sampler) if val_sampler is not None else None
        self.batch_size = batch_size
        self.max_epochs = max_epochs
        self.learning_rate = learning_rate
        self.seed = seed
        self.log_every = log_every
        self.checkpoint_every_epochs = checkpoint_every_epochs
        self.sample_visualizer = sample_visualizer
        self.log_interval = log_interval
        self.hparams = hparams
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self._profiling = False
        self._preempt: Optional[PreemptionGuard] = None

        self.mesh = mesh if mesh is not None else make_mesh(n_data=1)
        # dp, or dp x sp when the mesh has a non-trivial 'space' axis
        # (spatially-partitioned training: X axis sharded, XLA halos)
        self._batch_sharding = train_batch_sharding(self.mesh)
        self._replicated = replicated(self.mesh)
        n_space = self.mesh.shape.get(SPACE_AXIS, 1)
        if n_space > 1:
            if getattr(train_sampler, "device_resident", False):
                raise ValueError(
                    "spatial partitioning requires the host sampler "
                    "(DevicePatchSampler gathers its own sharding)"
                )
            if jax.process_count() > 1:
                # dp x sp across hosts: every process contributes its rows
                # of the global batch at FULL spatial extent, and
                # make_array_from_process_local_data lays them out over
                # (data, space).  That requires each process to own whole
                # (data-row x all-space) blocks of the mesh — i.e. the
                # 'space' axis must fit inside one process's devices.
                n_local = jax.local_device_count()
                if n_local % n_space:
                    raise ValueError(
                        f"spatial partitioning across process boundaries "
                        f"is not supported: the 'space' axis ({n_space}) "
                        f"must divide the per-process device count "
                        f"({n_local}) so every host owns whole spatial "
                        f"rows of the mesh"
                    )
            px = int(np.asarray(train_sampler.patch_size)[0])
            if px % n_space:
                raise ValueError(
                    f"patch X extent {px} not divisible by the 'space' "
                    f"axis ({n_space})"
                )

        self.metrics = MetricsLogger(log_dir, extra_sinks=metric_sinks) if log_dir else None
        if keep_checkpoints < 1:
            raise ValueError(
                f"keep_checkpoints must be >= 1, got {keep_checkpoints}"
            )
        self.ckpt = CheckpointManager(
            model_dir, max_to_keep=keep_checkpoints
        ) if model_dir else None
        self._last_saved_step: Optional[int] = None
        # best-val checkpoint (PL 0.9's default checkpoint_callback keeps the
        # single best-val_loss checkpoint alongside resumable ones, reference
        # train_seg.py:122-131): a second max_to_keep=1 manager under
        # <model_dir>/best, written only when `monitor` improves
        self.monitor = monitor
        self.save_best = bool(save_best and model_dir)
        # PL Trainer runtime knobs (reference train_seg.py:122-132 gets these
        # from pl.Trainer): check_val_every_n_epoch gates val frequency;
        # early stopping is PL's EarlyStopping(monitor, patience, min_delta,
        # mode='min') — stop after `patience` consecutive val checks without
        # a > min_delta improvement.  Multi-host safe: val batches are
        # globally assembled, so every process computes the identical mean
        # and takes the stop branch together.
        if check_val_every_n_epoch < 1:
            raise ValueError("check_val_every_n_epoch must be >= 1")
        self.check_val_every_n_epoch = check_val_every_n_epoch
        if early_stop_patience and val_sampler is None:
            raise ValueError(
                "early_stop_patience needs a validation set (the monitored "
                f"metric {monitor!r} comes from val epochs)"
            )
        self.early_stop_patience = early_stop_patience
        self.early_stop_min_delta = early_stop_min_delta
        self._es_best: Optional[float] = None
        self._es_stale = 0
        # bound epochs for smoke runs (PL train/val_percent_check analogue,
        # absolute batch counts; 0 = full epoch)
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self._model_dir = model_dir
        self._best_value: Optional[float] = None
        self._ckpt_best: Optional[CheckpointManager] = None

        patch = np.asarray(train_sampler.patch_size)
        in_ch = task.model.config.in_channels
        self.sample_shape = (batch_size, *patch.tolist(), in_ch)
        self.state: Optional[TrainState] = None

        # multi-host: batch_size is GLOBAL; each host samples only its rows
        # and the global array is assembled in device_prefetch (SURVEY §5.8)
        from tpu_mednet.parallel.multihost import local_batch_size
        self.local_batch_size = local_batch_size(batch_size)
        if self.local_batch_size != batch_size and getattr(
            train_sampler, "device_resident", False
        ):
            raise ValueError(
                "DevicePatchSampler is single-process; use PatchSampler "
                "for multi-host input pipelines"
            )

        # optimizer/schedule config: default = the reference's plain
        # Adam(lr) (segmentation.py:119-120); schedules with a run-length
        # horizon get total_steps filled from this run's shape
        self._steps_per_epoch = max(
            len(self.train_sampler) // self.local_batch_size, 1
        )
        if limit_train_batches:
            self._steps_per_epoch = min(self._steps_per_epoch,
                                        limit_train_batches)
        self.optim = (optim or OptimizerConfig(learning_rate=learning_rate)) \
            .resolve_total_steps(self._steps_per_epoch * max_epochs)

        # ReduceLROnPlateau: host-side controller fed by val epochs
        if self.optim.schedule == "plateau" and val_sampler is None:
            raise ValueError(
                "--lr_schedule plateau needs a validation set (the LR "
                f"decays on plateaus of {monitor!r})"
            )
        self._plateau = PlateauController(self.optim) \
            if self.optim.schedule == "plateau" else None

        # non-finite protection (production robustness the reference lacks;
        # PL's `terminate_on_nan` analogue): 'skip' gates the update inside
        # the jit'd step (a NaN/Inf loss or gradient leaves params, opt state
        # and EMA untouched) and logs the per-epoch skip count;
        # 'terminate' additionally checkpoints the (clean) state and raises.
        # Either way an epoch where EVERY step was non-finite raises —
        # training is not progressing.  Detection is device-side, so the
        # guard adds no per-step host sync.
        if nonfinite not in ("off", "skip", "terminate"):
            raise ValueError(
                f"nonfinite must be off/skip/terminate, got {nonfinite!r}"
            )
        self.nonfinite = nonfinite

        # landmark labels carry continuous heatmap targets in their
        # leading channels (heatmaps first / class map last): the spatial
        # transform warps those with the image's linear interpolation,
        # not nearest (see ops/augment.spatial_3d)
        num_hm = int(getattr(task, "num_heatmaps", 0) or 0)
        if (augment is not None and augment.wants_spatial() and num_hm
                and not augment.label_trilinear_channels):
            import dataclasses as _dc
            augment = _dc.replace(augment, label_trilinear_channels=num_hm)
        self.augment = augment

        # steps are built after the optimizer config resolves: the train
        # step owns the EMA update and validation monitors the EMA weights
        # (what gets deployed) when EMA is on
        self.train_step = make_train_step(
            task, augment=augment, ema_decay=self.optim.ema_decay,
            guard_nonfinite=nonfinite != "off",
            track_grad_norm=track_grad_norm,
        )
        self.eval_step = make_eval_step(
            task, use_ema=bool(self.optim.ema_decay)
        )

    # -- lifecycle --------------------------------------------------------

    def init_state(self, resume: Optional[str] = None) -> TrainState:
        state = create_train_state(
            self.task.model, self.sample_shape, self.learning_rate,
            seed=self.seed, optimizer=self.optim.build(),
            ema=bool(self.optim.ema_decay),
        )
        self.start_epoch = 0
        if resume:
            mgr = self.ckpt if (self.ckpt and str(self.ckpt.directory) == str(resume)) \
                else CheckpointManager(resume)
            # fail fast with the actual numbers when the CLI hparams build a
            # different architecture than the checkpoint holds — orbax's
            # tree-mismatch error at restore time is unactionable
            try:
                hp_prev = mgr.restore_hparams()
            except Exception:  # hparams side-car optional/corrupt: skip check
                hp_prev = None
            if hp_prev:
                _check_resume_architecture(hp_prev, self.task.model.config, resume)
                check_resume_optimizer(hp_prev, self.optim, resume)
            state, _ = mgr.restore(state)
            # continue epoch accounting from the restored step so a resumed
            # run trains to the ORIGINAL max_epochs total (PL
            # resume_from_checkpoint semantics, reference train_seg.py:123-125)
            # sampler len is per-host (keys pre-sharded), so divide by the
            # per-host batch rows to get global steps per epoch
            self.start_epoch = int(state.step) // self._steps_per_epoch
            logger.info(
                "resumed from %s at step %d (epoch %d)",
                resume, int(state.step), self.start_epoch,
            )
        state = jax.device_put(state, self._replicated)
        logger.info("model parameters: %.2fM", param_count(state) / 1e6)
        self.state = state
        if resume and self.save_best and self._best_dir().exists():
            # continue best-val tracking across the resume boundary so a
            # post-resume epoch only overwrites best/ when it actually beats
            # the pre-preemption best
            try:
                hp_best = self._best_mgr().restore_hparams()
            except Exception:
                hp_best = None
            info = (hp_best or {}).get("_best_monitor") or {}
            if info.get("metric") == self.monitor and info.get("value") is not None:
                self._best_value = float(info["value"])
                logger.info(
                    "resumed best %s=%.6g (step %s)",
                    self.monitor, self._best_value, info.get("step"),
                )
        return state

    # -- best-val checkpoint ------------------------------------------------

    def _best_dir(self):
        from pathlib import Path
        return Path(self._model_dir) / "best"

    def _best_mgr(self) -> CheckpointManager:
        if self._ckpt_best is None:
            self._ckpt_best = CheckpointManager(self._best_dir(), max_to_keep=1)
        return self._ckpt_best

    def _maybe_save_best(self, val_means: Dict[str, float]) -> bool:
        """Save ``<model_dir>/best`` when the monitored val metric improves.

        The functional analogue of PL 0.9's default ``ModelCheckpoint``
        (monitor='val_loss', save_top_k=1, mode='min') the reference gets
        implicitly from ``Trainer(...)`` (train_seg.py:122-131): best/ holds
        exactly one checkpoint — the lowest-``monitor`` step so far — and is
        a regular checkpoint directory, so predict/export point straight at
        it.  Multi-host safe: val batches are globally assembled, so every
        process computes the identical mean and takes this branch together.
        """
        if not self.save_best or self.monitor not in val_means:
            return False
        value = float(val_means[self.monitor])
        if self._best_value is not None and value >= self._best_value:
            return False
        self._best_value = value
        hp = dict(self.hparams or {})
        hp["_best_monitor"] = {"metric": self.monitor, "value": value,
                               "step": int(self.state.step)}
        self._best_mgr().save(int(self.state.step), self.state, hp)
        logger.info("new best %s=%.6g at step %d -> %s", self.monitor,
                    value, int(self.state.step), self._best_dir())
        return True

    def _save_ckpt(self) -> None:
        """Save a resumable checkpoint at the current step, once per step.

        The step can legitimately stand still across save sites — e.g. a
        fully non-finite epoch under ``nonfinite='skip'`` leaves it where
        the previous epoch's save put it — and orbax refuses a duplicate
        step with a ValueError that would mask the real control flow
        (NonFiniteError, preemption exit).  An existing checkpoint at this
        step already holds the identical state, so skipping is lossless.
        """
        assert self.ckpt is not None
        step = int(self.state.step)
        if step == self._last_saved_step or step in self.ckpt.available_steps:
            logger.info(
                "checkpoint at step %d already exists; not re-saving", step
            )
            return
        self.ckpt.save(step, self.state, self.hparams)
        self._last_saved_step = step

    def _should_early_stop(self, val_means: Dict[str, float]) -> bool:
        """PL EarlyStopping(monitor, patience, min_delta, mode='min').

        Counts consecutive val checks without a ``> min_delta`` improvement
        of ``monitor``; returns True once the count reaches ``patience``.
        """
        if not self.early_stop_patience or self.monitor not in val_means:
            return False
        value = float(val_means[self.monitor])
        if self._es_best is None or \
                value < self._es_best - self.early_stop_min_delta:
            self._es_best = value
            self._es_stale = 0
            return False
        self._es_stale += 1
        if self._es_stale >= self.early_stop_patience:
            logger.info(
                "early stopping: %s has not improved by > %g for %d val "
                "checks (best %.6g)", self.monitor,
                self.early_stop_min_delta, self._es_stale, self._es_best,
            )
            return True
        return False

    # -- epochs -----------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        assert self.state is not None
        step_times = []
        last_metrics = {}
        host_iter = self.train_sampler.batches(self.local_batch_size, shuffle=True)
        if getattr(self.train_sampler, "device_resident", False):
            batch_iter = host_iter  # batches are already in HBM
        else:
            batch_iter = device_prefetch(host_iter, sharding=self._batch_sharding)
        t_start = time.perf_counter()
        n_batches = 0
        nonfinite_acc = None  # device scalar, pulled once per epoch
        for batch in batch_iter:
            if self._preempt is not None and self._preempt.triggered:
                break
            if self.limit_train_batches and n_batches >= self.limit_train_batches:
                break
            t0 = time.perf_counter()
            if self.profile_dir and epoch == 0 and n_batches == 1:
                # skip step 0 (compile), trace a few steady-state steps
                jax.profiler.start_trace(self.profile_dir)
                self._profiling = True
            arrays = {"data": batch["data"], "label": batch["label"]}
            with jax.profiler.StepTraceAnnotation("train_step", step_num=n_batches):
                self.state, metrics = self.train_step(self.state, arrays)
            if self.nonfinite != "off":
                nf = metrics["nonfinite"]
                nonfinite_acc = nf if nonfinite_acc is None else nonfinite_acc + nf
            if self._profiling and n_batches >= self.profile_steps:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), self.state.params
                )
                jax.profiler.stop_trace()
                self._profiling = False
            if (n_batches % self.log_every) == 0:
                # sync + log (forces host transfer of the scalars only)
                scalars = {k: float(v) for k, v in metrics.items()}
                scalars["lr"] = read_current_lr(
                    self.optim, self.state.opt_state, int(self.state.step)
                )
                if self.metrics:
                    self.metrics.log_scalars(int(self.state.step), scalars)
                last_metrics = scalars
            step_times.append(time.perf_counter() - t0)
            n_batches += 1
        if self._profiling:
            # the epoch ended (too few batches, or preempted) before the
            # steady-state window closed — never leave a trace open
            jax.profiler.stop_trace()
            self._profiling = False
            logger.warning(
                "profile trace closed at epoch end after %d steps "
                "(< profile_steps=%d steady-state steps)",
                n_batches, self.profile_steps,
            )
        if nonfinite_acc is not None and n_batches:
            n_bad = int(float(jax.device_get(nonfinite_acc)))
            if n_bad:
                logger.warning(
                    "epoch %d: %d/%d steps had a non-finite loss or "
                    "gradient; their updates were skipped on device",
                    epoch, n_bad, n_batches,
                )
                if self.metrics:
                    self.metrics.log_scalars(
                        int(self.state.step), {"nonfinite_steps": float(n_bad)}
                    )
                if self.nonfinite == "terminate" or n_bad >= n_batches:
                    if self.ckpt:
                        # the gate skipped every poisoned update, so this
                        # checkpoint holds only finite params
                        self._save_ckpt()
                        self.ckpt.wait()
                    reason = ("every step of the epoch was non-finite"
                              if self.nonfinite != "terminate"
                              else "nonfinite='terminate'")
                    raise NonFiniteError(
                        f"epoch {epoch}: {n_bad}/{n_batches} non-finite "
                        f"steps ({reason}); last checkpoint holds the "
                        f"finite params from before the first bad step"
                    )
        wall = time.perf_counter() - t_start
        if n_batches:
            pps = n_batches * self.batch_size / wall
            logger.info(
                "epoch %d: %d steps, %.1f patches/s, train_loss=%s",
                epoch, n_batches, pps, last_metrics.get("train_loss"),
            )
            if self.metrics:
                self.metrics.log_scalars(
                    int(self.state.step), {"patches_per_sec": pps}
                )
        return last_metrics

    def val_epoch(self, epoch: int) -> Dict[str, float]:
        assert self.state is not None
        if self.val_sampler is None:
            return {}
        # accumulate metric scalars ON DEVICE and pull them to the host once
        # per epoch — a float() per metric per batch forces a device sync
        # every val batch, which serializes validation over the slow tunnel
        sums: Dict[str, jax.Array] = {}
        count = 0
        host_iter = self.val_sampler.batches(self.local_batch_size, shuffle=False)
        if getattr(self.val_sampler, "device_resident", False):
            batch_iter = host_iter
        else:
            batch_iter = device_prefetch(host_iter, sharding=self._batch_sharding)
        for i, batch in enumerate(batch_iter):
            if self.limit_val_batches and i >= self.limit_val_batches:
                break
            arrays = {"data": batch["data"], "label": batch["label"]}
            metrics = self.eval_step(self.state, arrays)
            if self.sample_visualizer is not None and i % self.log_interval == 0:
                self.sample_visualizer(self, batch, epoch, i)
            for k, v in metrics.items():
                sums[k] = v if k not in sums else sums[k] + v
            count += 1
        sums = jax.device_get(sums)  # single host pull for the whole epoch
        means = {k: float(v) / max(count, 1) for k, v in sums.items()}
        if self.metrics and means:
            self.metrics.log_scalars(int(self.state.step), means)
        if means:
            logger.info("epoch %d validation: %s", epoch, means)
        return means

    def fit(self, resume: Optional[str] = None) -> TrainState:
        if self.state is None:
            self.init_state(resume=resume)
        with PreemptionGuard() as guard:
            self._preempt = guard
            try:
                for epoch in range(getattr(self, "start_epoch", 0),
                                   self.max_epochs):
                    self.train_epoch(epoch)
                    if guard.triggered:
                        # preempted: persist progress so --resume continues
                        # from this step, then exit cleanly
                        if self.ckpt:
                            self._save_ckpt()
                        logger.warning(
                            "preempted at step %d (epoch %d): checkpoint "
                            "saved, exiting", int(self.state.step), epoch,
                        )
                        break
                    val_means = {}
                    if (epoch + 1) % self.check_val_every_n_epoch == 0:
                        val_means = self.val_epoch(epoch)
                        self._maybe_save_best(val_means)
                    if self._plateau is not None and self.monitor in val_means:
                        # decay the live LR leaf BEFORE the epoch checkpoint
                        # so the saved state carries the new LR
                        new_opt, new_lr = self._plateau.update(
                            self.state.opt_state,
                            float(val_means[self.monitor]),
                        )
                        if new_lr is not None:
                            self.state = self.state.replace(opt_state=new_opt)
                            logger.info(
                                "plateau: %s stale for %d val checks; "
                                "lr -> %g", self.monitor,
                                self.optim.lr_plateau_patience, new_lr,
                            )
                    saved = False
                    if self.ckpt and (epoch + 1) % self.checkpoint_every_epochs == 0:
                        self._save_ckpt()
                        saved = True
                    if self._should_early_stop(val_means):
                        if self.ckpt and not saved:
                            self._save_ckpt()
                        break
            finally:
                self._preempt = None
                # also on the exception paths (NonFiniteError, interrupts):
                # wait out in-flight async orbax saves — an abandoned tmp
                # step would be unreadable — and flush buffered metrics
                if self.ckpt:
                    self.ckpt.wait()
                if self._ckpt_best is not None:
                    self._ckpt_best.wait()
                if self.metrics:
                    self.metrics.close()
        return self.state
