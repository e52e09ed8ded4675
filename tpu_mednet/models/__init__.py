from tpu_mednet.models.blocks import (
    ConvLayer,
    DecoderStage,
    DoubleConv,
    EncoderStage,
    ExtResNetBlock,
    FinalConv,
)
from tpu_mednet.models.unet import (
    ResidualUNet3D,
    UNet3D,
    UNet3DBase,
    UNetConfig,
    create_feature_maps,
)

__all__ = [
    "ConvLayer",
    "DoubleConv",
    "ExtResNetBlock",
    "EncoderStage",
    "DecoderStage",
    "FinalConv",
    "UNet3D",
    "ResidualUNet3D",
    "UNet3DBase",
    "UNetConfig",
    "create_feature_maps",
]
