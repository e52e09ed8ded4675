from tpu_mednet.ops import losses
from tpu_mednet.ops.augment import AugmentConfig, apply_augmentations
from tpu_mednet.ops.heatmap import (
    batched_gaussian_heatmaps,
    gaussian_heatmap,
    heatmap_argmax_coords,
)

__all__ = [
    "losses",
    "AugmentConfig",
    "apply_augmentations",
    "gaussian_heatmap",
    "batched_gaussian_heatmaps",
    "heatmap_argmax_coords",
]
