"""jit'd train/eval steps with on-device augmentation and donated buffers.

TPU-native replacement for the reference's LightningModule
``training_step``/``validation_step``
(`/root/reference/midasmednet/segmentation.py:58-109`;
`landmarks.py:66-162`): one traced function containing augmentation,
forward, loss, backward and the optimizer update — XLA fuses the lot; the
train state is donated so params/opt-state update in place in HBM.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tpu_mednet.ops.augment import AugmentConfig, apply_augmentations
from tpu_mednet.train.state import TrainState

Array = jax.Array
Batch = Dict[str, Array]


def make_train_step(
    task,
    augment: Optional[AugmentConfig] = None,
    donate: bool = True,
    ema_decay: float = 0.0,
    guard_nonfinite: bool = False,
    track_grad_norm: bool = False,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, Array]]]:
    """Build the jit'd training step for a task.

    The returned step takes ``(state, batch)`` and returns
    ``(new_state, metrics)`` where metrics includes ``train_loss`` (the
    scalar name the reference logs, segmentation.py:64) plus any task aux
    (class_loss / regression_loss for landmarks, landmarks.py:80-83).

    ``ema_decay`` > 0 maintains ``state.ema_params`` as
    ``ema = decay * ema + (1 - decay) * params`` inside the same jit (one
    fused update per step).  With gradient accumulation the EMA advances
    only on the micro-step where optax.MultiSteps applies the real update
    — otherwise the decay would compound k times per optimizer step
    against unchanged params, silently shrinking the EMA time constant to
    ``decay^k``.  The state must have been created with
    ``create_train_state(..., ema=True)``.

    ``guard_nonfinite`` adds an on-device update gate: when the loss or
    any gradient leaf is non-finite the whole update (optimizer, EMA,
    batch stats, step count) is skipped via ``lax.cond`` — the params can
    never absorb a NaN/Inf — and the metrics gain ``nonfinite`` (0.0/1.0
    per step).  The host policy (log / stop) lives in the Trainer; the
    gate itself stays inside the jit so it costs no extra device sync.

    ``track_grad_norm`` adds ``grad_norm`` (the pre-clip global L2 norm,
    PL ``track_grad_norm=2``) to the metrics — the observability signal
    for tuning ``grad_clip_norm`` and diagnosing loss spikes.  Computed
    on device from gradients already in registers; like every metric it
    only syncs when the Trainer logs.
    """
    model = task.model
    if ema_decay and not (0.0 < ema_decay < 1.0):
        raise ValueError(f"ema_decay must be in (0, 1), got {ema_decay}")

    def step(state: TrainState, batch: Batch):
        aug_rng, new_rng = jax.random.split(state.rng)
        data = batch["data"].astype(model.config.dtype)
        label = batch["label"]
        if augment is not None:
            # spatial transforms (mirror / elastic / rotate / scale) must
            # move the label with the image
            if augment.mirror_axes or augment.wants_spatial():
                data, label = apply_augmentations(data, aug_rng, augment, label=label)
            else:
                data = apply_augmentations(data, aug_rng, augment)
        task_batch = {"data": data, "label": label}

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                outputs, mutated = model.apply(
                    variables, data, train=True, mutable=["batch_stats"]
                )
                new_stats = mutated["batch_stats"]
            else:
                outputs = model.apply(variables, data, train=True)
                new_stats = None
            loss, aux = task.loss_fn(outputs, task_batch)
            return loss, (aux, new_stats)

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        def apply_update(operand):
            st, gr, stats = operand
            ns = st.apply_gradients(grads=gr, rng=new_rng, batch_stats=stats)
            if ema_decay and st.ema_params is not None:
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: e * ema_decay
                    + p.astype(e.dtype) * (1.0 - ema_decay),
                    st.ema_params, ns.params,
                )
                if isinstance(ns.opt_state, optax.MultiStepsState):
                    # gradient accumulation: the inner optimizer only
                    # stepped when mini_step wrapped to 0; on accumulating
                    # micro-steps the params are unchanged and the EMA must
                    # hold still (else decay compounds to decay^k per real
                    # update)
                    did_step = ns.opt_state.mini_step == 0
                    new_ema = jax.tree_util.tree_map(
                        lambda n, e: jnp.where(did_step, n, e),
                        new_ema, st.ema_params,
                    )
                ns = ns.replace(ema_params=new_ema)
            return ns

        metrics = {"train_loss": loss, **aux}
        if track_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        if guard_nonfinite:
            finite = jax.tree_util.tree_reduce(
                lambda ok, g: ok & jnp.all(jnp.isfinite(g)),
                grads, jnp.isfinite(loss),
            )
            new_state = jax.lax.cond(
                finite,
                apply_update,
                # skip: keep params/opt-state/EMA/batch-stats/step untouched;
                # only the PRNG advances so the next batch draws fresh noise
                lambda op: op[0].replace(rng=new_rng),
                (state, grads, new_stats),
            )
            metrics["nonfinite"] = 1.0 - finite.astype(jnp.float32)
        else:
            new_state = apply_update((state, grads, new_stats))
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    task, use_ema: bool = False
) -> Callable[[TrainState, Batch], Dict[str, Array]]:
    """Build the jit'd validation step returning the task's val metrics.

    With ``use_ema`` the forward runs on ``state.ema_params`` (falling back
    to the raw params when the state carries no EMA) — validation then
    monitors the averaged weights, which is what gets deployed.
    """
    model = task.model

    def step(state: TrainState, batch: Batch) -> Dict[str, Array]:
        data = batch["data"].astype(model.config.dtype)
        params = state.ema_params \
            if (use_ema and state.ema_params is not None) else state.params
        variables = {"params": params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        outputs = model.apply(variables, data, train=False)
        return task.val_metrics(outputs, {"data": data, "label": batch["label"]})

    return jax.jit(step)


def make_predict_step(task, tta_flips=()) -> Callable[[Any, Array], Array]:
    """jit'd inference step: forward (eval mode) + task postprocessing.

    Takes raw variables (not TrainState) so frozen checkpoints restore
    straight into it (reference predict.py:46-50 ``load_from_checkpoint`` +
    ``freeze``).  With ``tta_flips`` (spatial axes 0..2), the forward runs
    mirror test-time augmentation: 2^k flips averaged in activation space
    before the argmax (``inference.common.tta_split_activations``).
    """
    model = task.model
    tta_flips = tuple(tta_flips)

    def step(variables, data: Array) -> Array:
        if tta_flips:
            from tpu_mednet.inference.common import (
                postprocess_activations,
                tta_split_activations,
            )
            act = tta_split_activations(task, variables, data, tta_flips)
            return postprocess_activations(task, act)
        outputs = model.apply(variables, data.astype(model.config.dtype), train=False)
        return task.predict_postprocess(outputs)

    return jax.jit(step)
