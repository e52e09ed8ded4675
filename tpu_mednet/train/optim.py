"""Optimizer / LR-schedule configuration for the training runtime.

The reference hardcodes ``torch.optim.Adam(lr)``
(`/root/reference/midasmednet/segmentation.py:119-120`,
`landmarks.py:176-177`) and delegates everything else to
pytorch-lightning.  Production training needs the standard knobs PL
exposes around that — decoupled weight decay, gradient clipping, warmup +
decay schedules, gradient accumulation (PL's ``accumulate_grad_batches``)
— so this module provides them as one declarative config compiled to a
single optax ``GradientTransformation`` that lives inside the jit'd train
step (no Python in the hot loop; the schedule is a traced function of the
optax step count, so it is resume-safe by construction: the count restores
with the checkpoint).

Tree-shape notes (resume safety): the optax state TREE depends on the
optimizer family, on whether clipping/accumulation are enabled, and on
whether the LR is a traced schedule vs a static float.  ``signature()``
captures exactly those drivers; the Trainer compares it against the
checkpoint's hparams side-car on ``--resume`` and fails with the actual
mismatch instead of orbax's unactionable tree error.  A *constant*
schedule deliberately passes the raw float to optax so the state tree is
identical to what rounds 1-3 checkpoints hold.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import optax

Schedule = Callable[[int], float]

_OPTIMIZERS = ("adam", "adamw", "sgd")
_SCHEDULES = ("constant", "cosine", "linear", "poly", "step", "plateau")


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Declarative optimizer + schedule description.

    ``total_steps == 0`` means "fill in from the run length" — the Trainer
    substitutes ``steps_per_epoch * max_epochs`` before building.
    """

    name: str = "adam"
    learning_rate: float = 1e-3
    weight_decay: float = 0.0          # decoupled (adamw); L2-coupled for sgd
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    momentum: float = 0.9              # sgd only
    nesterov: bool = False             # sgd only
    grad_clip_norm: float = 0.0        # 0 = off
    schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: int = 0               # cosine/linear/poly horizon
    end_lr_factor: float = 0.0         # final lr = learning_rate * factor
    poly_power: float = 0.9
    lr_decay_every: int = 0            # step schedule: steps between decays
    lr_decay_rate: float = 0.1         # step schedule: multiplicative factor
    accumulate_grad_batches: int = 1   # PL accumulate_grad_batches parity
    ema_decay: float = 0.0             # weight EMA (0 = off; e.g. 0.999)
    lr_plateau_factor: float = 0.1     # plateau: multiply lr by this
    lr_plateau_patience: int = 10      # plateau: stale val checks before decay
    lr_plateau_min_delta: float = 0.0  # plateau: improvement threshold
    min_lr: float = 0.0                # plateau: floor

    def __post_init__(self):
        if self.name not in _OPTIMIZERS:
            raise ValueError(
                f"unknown optimizer {self.name!r} (one of {_OPTIMIZERS})"
            )
        if self.schedule not in _SCHEDULES:
            raise ValueError(
                f"unknown lr schedule {self.schedule!r} (one of {_SCHEDULES})"
            )
        if self.schedule == "step" and self.lr_decay_every <= 0:
            raise ValueError(
                "--lr_schedule step requires --lr_decay_every > 0"
            )
        if self.accumulate_grad_batches < 1:
            raise ValueError("--accumulate_grad_batches must be >= 1")
        if self.ema_decay and not (0.0 < self.ema_decay < 1.0):
            raise ValueError(
                f"--ema_decay must be in (0, 1), got {self.ema_decay}"
            )
        if self.schedule == "plateau":
            if self.warmup_steps:
                raise ValueError(
                    "--lr_schedule plateau does not compose with "
                    "--warmup_steps (plateau IS the schedule: the LR only "
                    "moves on validation plateaus)"
                )
            if not (0.0 < self.lr_plateau_factor < 1.0):
                raise ValueError(
                    "--lr_plateau_factor must be in (0, 1), got "
                    f"{self.lr_plateau_factor}"
                )
            if self.lr_plateau_patience < 1:
                raise ValueError("--lr_plateau_patience must be >= 1")
        if self.name == "adam" and self.weight_decay:
            raise ValueError(
                "--weight_decay with --optimizer adam is silently ignored "
                "by torch semantics people usually don't want; use adamw "
                "(decoupled) or sgd (L2-coupled)"
            )

    @classmethod
    def from_hparams(cls, hparams) -> "OptimizerConfig":
        """Build from a parsed CLI namespace (missing flags -> defaults)."""
        hp = vars(hparams) if not isinstance(hparams, dict) else hparams
        fields = {f.name for f in dataclasses.fields(cls)}
        alias = {"optimizer": "name", "lr_schedule": "schedule"}
        kwargs = {}
        for key, value in hp.items():
            key = alias.get(key, key)
            if key in fields and value is not None:
                kwargs[key] = value
        return cls(**kwargs)

    # -- schedule ----------------------------------------------------------

    def needs_total_steps(self) -> bool:
        return self.schedule in ("cosine", "linear", "poly")

    def resolve_total_steps(self, total_micro_steps: int) -> "OptimizerConfig":
        """Fill ``total_steps`` from the run length when left at 0.

        ``total_micro_steps`` is the run's batch count; schedules run in
        *optimizer* steps, which advance once per ``accumulate_grad_batches``
        micro-batches.  (An explicit ``--total_steps`` is likewise in
        optimizer steps.)
        """
        if self.total_steps or not self.needs_total_steps():
            return self
        total = max(int(total_micro_steps) // self.accumulate_grad_batches, 1)
        return dataclasses.replace(self, total_steps=total)

    def make_schedule(self) -> Schedule:
        """The LR as a function of the optax update count.

        With gradient accumulation the count advances once per
        *accumulated* step (optax.MultiSteps only runs the inner update
        on the k-th micro-batch), so schedules are in units of real
        optimizer steps regardless of accumulation.
        """
        lr, end = self.learning_rate, self.learning_rate * self.end_lr_factor
        decay_steps = max(self.total_steps - self.warmup_steps, 1)
        if self.schedule in ("constant", "plateau"):
            # plateau has no closed-form schedule (the Trainer rewrites the
            # live LR leaf on validation plateaus); report the initial LR
            base = optax.constant_schedule(lr)
        elif self.schedule == "cosine":
            if not self.total_steps:
                raise ValueError("cosine schedule needs total_steps")
            base = optax.cosine_decay_schedule(
                lr, decay_steps, alpha=self.end_lr_factor
            )
        elif self.schedule == "linear":
            if not self.total_steps:
                raise ValueError("linear schedule needs total_steps")
            base = optax.linear_schedule(lr, end, decay_steps)
        elif self.schedule == "poly":
            if not self.total_steps:
                raise ValueError("poly schedule needs total_steps")
            base = optax.polynomial_schedule(
                lr, end, power=self.poly_power, transition_steps=decay_steps
            )
        else:  # step
            base = optax.exponential_decay(
                lr, transition_steps=self.lr_decay_every,
                decay_rate=self.lr_decay_rate, staircase=True,
            )
        if self.warmup_steps:
            warmup = optax.linear_schedule(0.0, lr, self.warmup_steps)
            return optax.join_schedules([warmup, base], [self.warmup_steps])
        return base

    def lr_at(self, state_step: int) -> float:
        """LR at a flax ``state.step`` (micro-batch count) — for logging."""
        count = int(state_step) // self.accumulate_grad_batches
        return float(self.make_schedule()(count))

    # -- optimizer ---------------------------------------------------------

    def _is_stateful_schedule(self) -> bool:
        # plateau passes the float LR into inject_hyperparams (its own tree
        # change, flagged separately in signature())
        return not (self.schedule in ("constant", "plateau")
                    and not self.warmup_steps)

    def build(self) -> optax.GradientTransformation:
        """Compile to a single optax transformation chain."""
        # constant+no-warmup passes the float so the opt-state tree matches
        # historic (plain optax.adam(lr)) checkpoints exactly
        lr = self.make_schedule() if self._is_stateful_schedule() \
            else self.learning_rate
        if self.name == "adam":
            fn = optax.adam
            kw = dict(b1=self.beta1, b2=self.beta2, eps=self.eps)
            static = ()
        elif self.name == "adamw":
            fn = optax.adamw
            kw = dict(b1=self.beta1, b2=self.beta2, eps=self.eps,
                      weight_decay=self.weight_decay)
            static = ()
        else:
            fn = optax.sgd
            kw = dict(momentum=self.momentum, nesterov=self.nesterov)
            static = ("nesterov",)
        if self.schedule == "plateau":
            # the LR becomes a leaf of the optimizer state
            # (InjectHyperparamsState.hyperparams) that the Trainer rewrites
            # on validation plateaus via optax.tree_utils.tree_set — and
            # that checkpoints/restores with the rest of the state, so a
            # resumed run keeps its decayed LR
            base = optax.inject_hyperparams(fn, static_args=static)(
                learning_rate=lr, **kw
            )
        else:
            base = fn(lr, **kw)
        if self.name == "sgd" and self.weight_decay:
            # torch-style coupled L2 for sgd: applied to the gradient
            # BEFORE momentum, like torch.optim.SGD(weight_decay=...)
            base = optax.chain(
                optax.add_decayed_weights(self.weight_decay), base
            )
        if self.grad_clip_norm > 0:
            base = optax.chain(
                optax.clip_by_global_norm(self.grad_clip_norm), base
            )
        if self.accumulate_grad_batches > 1:
            base = optax.MultiSteps(
                base, every_k_schedule=self.accumulate_grad_batches
            ).gradient_transformation()
        return base

    def signature(self) -> dict:
        """The opt-state TREE-shape drivers, for resume compatibility.

        Two configs with equal signatures restore into each other's
        checkpoints (values like the LR or decay rate may differ; the
        pytree structure does not).
        """
        return {
            "optimizer": self.name,
            "grad_clip": bool(self.grad_clip_norm > 0),
            "accumulate_grad_batches": int(self.accumulate_grad_batches),
            "stateful_schedule": self._is_stateful_schedule(),
            # EMA lives on the TrainState, not in optax, but it changes the
            # checkpoint's state tree all the same
            "ema": bool(self.ema_decay),
            # plateau wraps the optimizer in inject_hyperparams (extra
            # hyperparams leaves in the opt state)
            "plateau": self.schedule == "plateau",
            "sgd_weight_decay": bool(
                self.name == "sgd" and self.weight_decay
            ),
            "sgd_momentum": bool(self.name == "sgd" and self.momentum),
        }


class PlateauController:
    """ReduceLROnPlateau: decay the live LR leaf on validation plateaus.

    Host-side mirror of ``torch.optim.lr_scheduler.ReduceLROnPlateau``
    (mode='min'): after ``patience`` consecutive val checks without a
    ``> min_delta`` improvement of the monitored value, the LR leaf inside
    the optimizer state (``inject_hyperparams``) is multiplied by
    ``factor``, floored at ``min_lr``, and the stale counter resets.  The
    LR lives in the checkpointed state, so resume keeps the decayed value;
    the plateau *counter* restarts on resume (torch's scheduler state is
    likewise not in the reference's PL checkpoints).

    Multi-host safe for the same reason early stopping is: every process
    computes identical val means from globally assembled batches, so all
    take the decay branch together.
    """

    def __init__(self, cfg: OptimizerConfig):
        if cfg.schedule != "plateau":
            raise ValueError("PlateauController needs schedule='plateau'")
        self.cfg = cfg
        self._best: Optional[float] = None
        self._stale = 0

    def update(self, opt_state, value: float):
        """Feed one monitored value; returns (opt_state, new_lr or None)."""
        import optax.tree_utils as otu

        if self._best is None or \
                value < self._best - self.cfg.lr_plateau_min_delta:
            self._best = float(value)
            self._stale = 0
            return opt_state, None
        self._stale += 1
        if self._stale < self.cfg.lr_plateau_patience:
            return opt_state, None
        self._stale = 0
        current = float(otu.tree_get(opt_state, "learning_rate"))
        new_lr = max(current * self.cfg.lr_plateau_factor, self.cfg.min_lr)
        # relative tolerance: the leaf is float32, so a floor already
        # reached can read back epsilon-above min_lr
        if new_lr >= current * (1.0 - 1e-6):  # already at the floor
            return opt_state, None
        import jax.numpy as jnp
        opt_state = otu.tree_set(
            opt_state, learning_rate=jnp.asarray(new_lr, jnp.float32)
        )
        return opt_state, new_lr


def read_current_lr(cfg: OptimizerConfig, opt_state, state_step: int) -> float:
    """The LR in effect now — plateau reads the live leaf, others compute."""
    if cfg.schedule == "plateau":
        import optax.tree_utils as otu
        return float(otu.tree_get(opt_state, "learning_rate"))
    return cfg.lr_at(state_step)


def check_resume_optimizer(hp_prev: dict, cfg: OptimizerConfig,
                           resume) -> None:
    """Refuse a --resume whose optimizer state tree can't hold ours.

    Reads the optimizer-shaped keys out of the checkpoint's hparams
    side-car (written as the raw CLI namespace) and compares signatures.
    Side-cars predating these flags (rounds 1-3) carry none of the keys
    and are treated as the historic plain-Adam configuration.
    """
    keys = ("optimizer", "lr_schedule", "warmup_steps", "grad_clip_norm",
            "accumulate_grad_batches", "weight_decay", "momentum",
            "ema_decay", "lr_decay_every")
    if not any(k in hp_prev for k in keys):
        prev = OptimizerConfig()  # pre-flag checkpoint: plain Adam
    else:
        prev = OptimizerConfig.from_hparams(
            {k: hp_prev[k] for k in keys if k in hp_prev}
        )
    ours, theirs = cfg.signature(), prev.signature()
    if ours != theirs:
        diffs = [f"{k}: checkpoint {theirs[k]} vs CLI {ours[k]}"
                 for k in ours if ours[k] != theirs[k]]
        raise ValueError(
            f"--resume {resume}: the checkpoint's optimizer state has a "
            f"different structure ({'; '.join(diffs)}). Pass matching "
            "--optimizer/--lr_schedule/--grad_clip_norm/"
            "--accumulate_grad_batches, or start a fresh run."
        )
