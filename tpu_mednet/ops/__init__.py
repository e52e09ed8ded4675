from tpu_mednet.ops import losses
from tpu_mednet.ops.augment import AugmentConfig, apply_augmentations

__all__ = ["losses", "AugmentConfig", "apply_augmentations"]
