"""Backbone zoo (parity tier for the reference's ``backbones/``).

All backbones are input-size-free NHWC flax modules returning either the
final feature map or an ``endpoints`` list (lowest-stride first) when
``return_endpoints=True``, mirroring ``backbones/resnet_common.py:195,342``.
Dilation ("atrous") is a construction-time ``output_stride`` parameter —
the TPU-native equivalent of the reference's post-construction stride
rewrites (``backbones/resnet_common.py:561``).
"""

from iseg_tpu.backbones.registry import register_backbone, get_backbone, list_backbones
from iseg_tpu.backbones.pretrained import (
    auto_calibrate_dcn,
    load_pretrained_backbone,
    name_map_for,
)

__all__ = [
    "register_backbone",
    "get_backbone",
    "list_backbones",
    "auto_calibrate_dcn",
    "load_pretrained_backbone",
    "name_map_for",
]
