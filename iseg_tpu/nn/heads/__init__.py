"""Segmentation heads (parity tier for the reference's head layers in
``layers/``: aspp.py, fpn.py, nasfpn.py, fapn.py, jpu.py, simpledecoder.py).

Protocol: a head takes the backbone ``endpoints`` list (lowest stride
first) plus ``train``, and returns a feature map or a list of them (main
output first) — ``SegManaged`` attaches the logits convs.
"""

from iseg_tpu.nn.heads.simpledecoder import SimpleDecoder
from iseg_tpu.nn.heads.aspp import ASPP, AtrousSpatialPyramidPooling

__all__ = ["SimpleDecoder", "ASPP", "AtrousSpatialPyramidPooling"]
