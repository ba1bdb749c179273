"""Reusable neural-net blocks (parity tier for the reference's ``layers/``).

Everything is a flax ``nn.Module`` in NHWC layout with a fp32-params /
bf16-compute dtype policy threaded via ``dtype`` / ``param_dtype``.
"""

from iseg_tpu.nn.norm import (
    normalization,
    BatchNorm,
    SyncBatchNorm,
    GroupNorm,
    LayerNorm,
    RMSNorm,
)
from iseg_tpu.nn.conv import ConvNormAct, NormConvAct, SepConvNormAct
from iseg_tpu.nn.blocks import (
    DropPath,
    SqueezeExcite,
    ImageLevelBlock,
    CommonEndBlock,
    DenseExt,
    GlobalResponseNorm,
    scale_grads,
    adaptive_average_pooling_2d,
)

__all__ = [
    "normalization",
    "BatchNorm",
    "SyncBatchNorm",
    "GroupNorm",
    "LayerNorm",
    "RMSNorm",
    "ConvNormAct",
    "NormConvAct",
    "SepConvNormAct",
    "DropPath",
    "SqueezeExcite",
    "ImageLevelBlock",
    "CommonEndBlock",
    "DenseExt",
    "GlobalResponseNorm",
    "scale_grads",
    "adaptive_average_pooling_2d",
]
