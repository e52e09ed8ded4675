"""Segmentation task: residual 3D U-Net + Dice/CE loss + dice metrics.

Functional re-design of the reference ``SegmentationNet``
(`/root/reference/midasmednet/segmentation.py:22-131`): instead of a
LightningModule subclassing the model, a small task object bundles the model
with pure loss/metric functions consumed by the jit'd train/eval steps.

Semantics preserved:
- the class-value map is the LAST label channel (segmentation.py:60,96);
- loss is ``DiceLoss(weight)`` for 'DICE' or plain cross-entropy for 'CE'
  (segmentation.py:43-49, with the reference CELoss double-softmax defect
  fixed — SURVEY.md §2.4);
- validation logs ``val_loss`` and per-channel ``val_dice{c}``
  (segmentation.py:104-117).
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


@dataclasses.dataclass
class SegmentationTask:
    """Bundles model + loss config for volumetric multi-class segmentation."""

    model: UNet3DBase
    loss: str = "DICE"  # 'DICE' | 'CE'
    loss_weight: Optional[Sequence[float]] = None

    @classmethod
    def from_hparams(cls, hparams) -> "SegmentationTask":
        """Build from a train_seg-style hparams namespace
        (in_channels/out_channels/fmaps/loss/loss_weight)."""
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
            loss=getattr(hparams, "loss", "DICE"),
            loss_weight=getattr(hparams, "loss_weight", None),
        )

    @property
    def out_channels(self) -> int:
        return self.model.config.out_channels

    def _weight(self) -> Optional[Array]:
        if self.loss_weight is None:
            return None
        return jnp.asarray(self.loss_weight, dtype=jnp.float32)

    def labels_from_batch(self, batch: Dict[str, Array]) -> Array:
        """Class map = last label channel (segmentation.py:60)."""
        return batch["label"][..., -1].astype(jnp.int32)

    def loss_fn(self, outputs: Array, batch: Dict[str, Array]
                ) -> Tuple[Array, Dict[str, Array]]:
        labels = self.labels_from_batch(batch)
        if self.loss == "DICE":
            loss = L.dice_loss(outputs, labels, weight=self._weight())
        elif self.loss == "CE":
            loss = L.ce_loss(outputs, labels, weight=self._weight())
        else:
            raise ValueError(f"loss must be 'DICE' or 'CE', got {self.loss!r}")
        return loss, {}

    def val_metrics(self, outputs: Array, batch: Dict[str, Array]
                    ) -> Dict[str, Array]:
        labels = self.labels_from_batch(batch)
        loss, _ = self.loss_fn(outputs, batch)
        per_channel = L.dice_metric(outputs, labels)
        metrics = {"val_loss": loss}
        for c in range(self.out_channels):
            metrics[f"val_dice{c}"] = per_channel[c]
        return metrics

    def predict_postprocess(self, logits: Array) -> Array:
        """softmax -> argmax class map, uint8, trailing singleton channel."""
        pred = jnp.argmax(jax.nn.softmax(logits, axis=-1), axis=-1)
        return pred[..., None].astype(jnp.uint8)
