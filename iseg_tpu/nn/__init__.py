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
from iseg_tpu.nn.attention import (
    MultiHeadSelfAttention2D,
    MultiHeadAxialAttention2D,
    DeformableMultiHeadAttention2D,
    SelfAttention2D,
)
from iseg_tpu.nn.dcn import DCNv2, DCNv3
from iseg_tpu.nn.hooks import HookPoint, get_taps
from iseg_tpu.nn.common_layers import pixel_shuffle, pixel_unshuffle

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
    "MultiHeadSelfAttention2D",
    "MultiHeadAxialAttention2D",
    "DeformableMultiHeadAttention2D",
    "SelfAttention2D",
    "DCNv2",
    "DCNv3",
    "HookPoint",
    "get_taps",
    "pixel_shuffle",
    "pixel_unshuffle",
]
