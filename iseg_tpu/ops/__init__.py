"""Numerics, resizing, and custom ops (incl. the Pallas kernel tier).

Parity tier for the reference's ``ops/`` + ``utils/op_utils.py`` +
``utils/common.py`` XLA-island functions.
"""

from iseg_tpu.ops.resize import resize_image, scaled_size, resample_abs_pos_embed
from iseg_tpu.ops.numerics import (
    safed_softmax,
    replace_nan,
    replace_non_finite,
    guard_grads,
    check_numerics,
    set_check_numerics_level,
    l2_normalize,
)

__all__ = [
    "resize_image",
    "scaled_size",
    "resample_abs_pos_embed",
    "safed_softmax",
    "replace_nan",
    "replace_non_finite",
    "guard_grads",
    "check_numerics",
    "set_check_numerics_level",
    "l2_normalize",
]
