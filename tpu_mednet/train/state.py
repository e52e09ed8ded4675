"""Train state: params + optimizer + PRNG + (optional) batch stats.

TPU-native replacement for the implicit torch autograd/optimizer state the
reference delegates to pytorch-lightning (`segmentation.py:119-120` — Adam).
Pure pytree state consumed/produced by jit'd steps with donated buffers.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState + per-step PRNG key + optional BatchNorm stats.

    ``ema_params`` (same pytree structure as ``params``, or None) holds an
    exponential moving average of the weights when EMA is enabled
    (``OptimizerConfig.ema_decay``); it rides in the state so checkpoints
    carry it and resume restores it.
    """

    rng: Any = None
    batch_stats: Any = None
    ema_params: Any = None


def create_train_state(
    model,
    sample_batch_shape,
    learning_rate: float,
    seed: int = 0,
    optimizer: Optional[optax.GradientTransformation] = None,
    ema: bool = False,
) -> TrainState:
    """Initialize model params and Adam (reference default) state.

    ``sample_batch_shape`` is the (N, X, Y, Z, C) shape used to trace init.
    With ``ema=True`` the state also tracks ``ema_params``, initialized to
    a copy of the fresh params.
    """
    init_rng, state_rng = jax.random.split(jax.random.PRNGKey(seed))
    dummy = jnp.zeros(sample_batch_shape, dtype=model.config.dtype)
    variables = jax.jit(model.init, static_argnames=("train",))(
        init_rng, dummy, train=False
    )
    tx = optimizer if optimizer is not None else optax.adam(learning_rate)
    params = variables["params"]
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        rng=state_rng,
        batch_stats=variables.get("batch_stats"),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
    )


def param_count(state: TrainState) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(state.params))
