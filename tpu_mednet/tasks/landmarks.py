"""Landmark task: heatmap regression + auxiliary segmentation head.

Functional re-design of the reference ``LandmarkNet``
(`/root/reference/midasmednet/landmarks.py:22-206`).  One U-Net produces
``num_heatmaps + num_classes`` output channels; the first ``num_heatmaps``
channels regress Gaussian landmark heatmaps, the rest are class logits
(landmarks.py:74-75,144-145).  ``num_heatmaps`` is defined by the length of
``loss_regression_weight`` (landmarks.py:57).

Label batch layout (channels-last): heatmap channels first, class-value map
LAST (dataset.py:322-330).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tpu_mednet.models.unet import ResidualUNet3D, UNet3DBase
from tpu_mednet.config import parse_remat as _parse_remat
from tpu_mednet.ops import losses as L

Array = jax.Array


def landmark_coordinate_error(pred_heatmaps: Array, true_heatmaps: Array) -> Array:
    """Mean Euclidean distance (voxels) between predicted and ground-truth
    heatmap peaks — the landmark accuracy metric of the north-star
    ("matched landmark coordinates", BASELINE.json).

    Landmarks whose GT heatmap is all-zero in the patch (landmark outside
    the crop) are excluded from the mean.
    """
    from tpu_mednet.ops.heatmap import heatmap_argmax_coords

    pred = heatmap_argmax_coords(pred_heatmaps).astype(jnp.float32)
    true = heatmap_argmax_coords(true_heatmaps).astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum((pred - true) ** 2, axis=-1))  # (..., L)
    present = jnp.max(
        true_heatmaps, axis=tuple(range(1, true_heatmaps.ndim - 1))
    ) > 0  # (N, L)
    return jnp.sum(dist * present) / jnp.clip(jnp.sum(present), min=1.0)


@dataclasses.dataclass
class LandmarkTask:
    """Joint heatmap-regression + segmentation multitask."""

    model: UNet3DBase
    loss_regression_weight: Sequence[float]
    loss_class: str = "DICE"  # 'DICE' | 'CE'
    loss_class_weight: Optional[Sequence[float]] = None
    loss_regression: str = "L2"  # 'L2' | 'L1'

    @classmethod
    def from_hparams(cls, hparams) -> "LandmarkTask":
        model = ResidualUNet3D(
            in_channels=hparams.in_channels,
            out_channels=hparams.out_channels,
            final_sigmoid=False,
            f_maps=hparams.fmaps,
            dtype=jnp.bfloat16 if getattr(hparams, "bf16", True) else jnp.float32,
            remat=_parse_remat(getattr(hparams, "remat", False)),
            packed=bool(getattr(hparams, "packed", False)),
        )
        return cls(
            model=model,
            loss_regression_weight=hparams.loss_regression_weight,
            loss_class=getattr(hparams, "loss_class", "DICE"),
            loss_class_weight=getattr(hparams, "loss_class_weight", None),
            loss_regression=getattr(hparams, "loss_regression", "L2"),
        )

    @property
    def num_heatmaps(self) -> int:
        return len(self.loss_regression_weight)

    @property
    def out_channels(self) -> int:
        return self.model.config.out_channels

    @property
    def num_classes(self) -> int:
        return self.out_channels - self.num_heatmaps

    def split_outputs(self, outputs: Array) -> Tuple[Array, Array]:
        """(heatmap channels, class logits) — landmarks.py:74-75."""
        h = self.num_heatmaps
        return outputs[..., :h], outputs[..., h:]

    def split_labels(self, batch: Dict[str, Array]) -> Tuple[Array, Array]:
        """(gt heatmaps float, class map int) — landmarks.py:68-70."""
        label = batch["label"]
        return label[..., :-1].astype(jnp.float32), label[..., -1].astype(jnp.int32)

    def loss_fn(self, outputs: Array, batch: Dict[str, Array]
                ) -> Tuple[Array, Dict[str, Array]]:
        heatmaps, labels = self.split_labels(batch)
        out_heatmaps, out_labels = self.split_outputs(outputs)
        cw = (
            jnp.asarray(self.loss_class_weight, dtype=jnp.float32)
            if self.loss_class_weight is not None else None
        )
        total, cls, reg = L.multitask_landmark_loss(
            out_labels, out_heatmaps, labels, heatmaps,
            regression_weights=self.loss_regression_weight,
            class_loss=self.loss_class,
            class_weight=cw,
            regression_loss=self.loss_regression,
        )
        return total, {"class_loss": cls, "regression_loss": reg}

    def val_metrics(self, outputs: Array, batch: Dict[str, Array]
                    ) -> Dict[str, Array]:
        heatmaps, labels = self.split_labels(batch)
        out_heatmaps, out_labels = self.split_outputs(outputs)
        total, aux = self.loss_fn(outputs, batch)
        per_channel = L.dice_metric(out_labels, labels)
        metrics = {
            "val_loss": total,
            "val_class_loss": aux["class_loss"],
            "val_regression_loss": aux["regression_loss"],
            "val_landmark_error": landmark_coordinate_error(out_heatmaps, heatmaps),
        }
        for c in range(self.num_classes):
            metrics[f"val_dice{c}"] = per_channel[c]
        return metrics

    def predict_postprocess(self, logits: Array) -> Array:
        """Reference predict.py:88-94: heatmaps clipped to [0,255] uint8,
        class channels softmax->argmax, heatmaps first, class map last."""
        out_heatmaps, out_labels = self.split_outputs(logits)
        pred = jnp.argmax(jax.nn.softmax(out_labels, axis=-1), axis=-1)
        hm = jnp.clip(out_heatmaps, 0.0, 255.0).astype(jnp.uint8)
        return jnp.concatenate([hm, pred[..., None].astype(jnp.uint8)], axis=-1)
