"""Ignore-label-aware segmentation losses.

Parity tier for the reference's ``losses/`` package.
"""

from iseg_tpu.losses.cross_entropy import (
    cross_entropy_ignore_label,
    softmax_focal_loss,
)
from iseg_tpu.losses.ohem import get_ohem_fn
from iseg_tpu.losses.dice import dice_loss, mask_loss
from iseg_tpu.losses.common import smooth_l1_loss, pixel_contrastive_loss
from iseg_tpu.losses.base import valid_mask, prepare_labels

__all__ = [
    "cross_entropy_ignore_label",
    "softmax_focal_loss",
    "get_ohem_fn",
    "dice_loss",
    "mask_loss",
    "smooth_l1_loss",
    "pixel_contrastive_loss",
    "valid_mask",
    "prepare_labels",
]
