"""Segmentation heads (parity tier for the reference's head layers in
``layers/``: aspp.py, fpn.py, nasfpn.py, fapn.py, jpu.py, simpledecoder.py).

Protocol: a head takes the backbone ``endpoints`` list (lowest stride
first) plus ``train``, and returns a feature map or a list of them (main
output first) — ``SegManaged`` attaches the logits convs.
"""

from iseg_tpu.nn.heads.simpledecoder import SimpleDecoder
from iseg_tpu.nn.heads.aspp import ASPP, AtrousSpatialPyramidPooling
from iseg_tpu.nn.heads.fpn import (
    FeaturePyramidNetwork,
    SemanticFPN,
    SemanticPyramidNetworkBlockV1,
    SemanticPyramidNetworkBlockV2,
)
from iseg_tpu.nn.heads.jpu import JPU, JointPyramidUpsampling
from iseg_tpu.nn.heads.fapn import (
    FAPN,
    FeatureAlignedPyramidNet,
    FeatureAlignment,
    FeatureSelectionModule,
)
from iseg_tpu.nn.heads.nasfpn import NASFPN

__all__ = [
    "SimpleDecoder",
    "ASPP",
    "AtrousSpatialPyramidPooling",
    "FeaturePyramidNetwork",
    "SemanticFPN",
    "SemanticPyramidNetworkBlockV1",
    "SemanticPyramidNetworkBlockV2",
    "FeatureSelectionModule",
    "FeatureAlignment",
    "JPU",
    "JointPyramidUpsampling",
    "FAPN",
    "FeatureAlignedPyramidNet",
    "NASFPN",
]
