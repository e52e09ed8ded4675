"""Serving export: self-contained inference artifacts via ``jax.export``.

The reference's deployment story is a live torch process calling
``load_from_checkpoint`` + ``freeze`` (`/root/reference/examples/predict.py:46-50`)
— serving requires the full model-building Python stack.  The TPU-native
equivalent is an ahead-of-time artifact: the jit'd forward + postprocess is
lowered to versioned StableHLO with the trained weights baked in as
constants, serialized to one file.  A serving system deserializes and calls
it WITHOUT tpu_mednet, flax, or the checkpoint — only jax + the bytes.

Properties:

- **weights baked in**: the artifact is standalone (the functional analogue
  of a frozen SavedModel / TorchScript export);
- **symbolic batch**: exported with a polymorphic leading axis by default,
  so one artifact serves any batch size without re-export;
- **cross-platform**: lowering for TPU does not need a TPU attached —
  ``platforms=("tpu", "cpu")`` produces an artifact that runs on both.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def detect_task_name(hparams) -> str:
    """'LandmarkNet' or 'SegmentationNet', from a checkpoint's hparams.

    A landmark training run always carries ``loss_regression_weight`` in
    its hparams (it defines ``num_heatmaps``, reference landmarks.py:57);
    a segmentation run never does.  Used to fail fast when a CLI would
    otherwise restore a checkpoint into the wrong task and silently bake
    the wrong postprocess.
    """
    hp = hparams if isinstance(hparams, dict) else vars(hparams)
    w = hp.get("loss_regression_weight")
    return "LandmarkNet" if w else "SegmentationNet"


def make_serving_fn(task, variables, tta_flips: Tuple[int, ...] = ()):
    """The (data) -> postprocessed-prediction function served at deploy time.

    ``data`` is (N, X, Y, Z, C); the compute-dtype cast happens inside (the
    device-side-cast convention of the inference pipelines).  Output is the
    task's predict postprocess — uint8 class map, or heatmaps + class
    probabilities for landmark tasks.  With ``tta_flips`` (spatial axes
    0..2), mirror test-time augmentation is baked INTO the artifact: 2^k
    flipped forwards averaged in activation space before the argmax.
    """
    model = task.model
    tta_flips = tuple(tta_flips)

    def serve(data):
        if tta_flips:
            from tpu_mednet.inference.common import (
                postprocess_activations,
                tta_split_activations,
            )
            act = tta_split_activations(task, variables, data, tta_flips)
            return postprocess_activations(task, act)
        logits = model.apply(
            variables, data.astype(model.config.dtype), train=False
        )
        return task.predict_postprocess(logits)

    return serve


def export_predictor(
    task,
    variables,
    patch_size: Sequence[int],
    batch_size: Optional[int] = None,
    in_dtype=jnp.float32,
    platforms: Optional[Tuple[str, ...]] = None,
    tta_flips: Tuple[int, ...] = (),
) -> jax_export.Exported:
    """Lower the task's inference step to a serializable ``Exported``.

    ``batch_size=None`` exports a symbolic leading axis (any batch size at
    call time); a concrete int pins it.  ``platforms`` defaults to the
    current default export platform; pass e.g. ``("tpu", "cpu")`` to build
    one artifact for both (no TPU needed at export time).
    """
    in_ch = task.model.config.in_channels
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        shape = (b, *(int(v) for v in patch_size), in_ch)
    else:
        shape = (int(batch_size), *(int(v) for v in patch_size), in_ch)
    spec = jax.ShapeDtypeStruct(shape, in_dtype)
    serve = jax.jit(make_serving_fn(task, variables, tta_flips=tta_flips))
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(serve, **kwargs)(spec)


def save_exported(exported: jax_export.Exported, path) -> None:
    """Serialize an ``Exported`` artifact to ``path`` (one opaque file)."""
    Path(path).write_bytes(exported.serialize())


def load_exported(path) -> jax_export.Exported:
    """Deserialize a serving artifact; run it with ``loaded.call(data)``."""
    return jax_export.deserialize(Path(path).read_bytes())
