"""FaPN: Feature-aligned Pyramid Network head.

Parity with the reference ``layers/fapn.py``:

- ``FeatureSelectionModule`` (:11): SE gate with ratio=1, relu, NO bias
  (two 1x1 convs, ``layers/se.py:22-43``) -> ``x*gate + x`` -> 1x1
  projection conv (no bias).
- ``FeatureAlignment`` (:44): upsample the coarse map to the fine map's
  size; ``feats_arm = FSM(fine)``; offsets come from a bias-free 1x1 conv
  over ``concat([feats_arm, 2 * feats_up])``; DCNv2 (custom-offset mode)
  deforms the UPSAMPLED COARSE map; output is ``relu(aligned) +
  feats_arm``.
- ``FeatureAlignedPyramidNet`` (:80): the coarsest endpoint enters RAW
  (optionally Dense-warped to ``filters`` when ``warp_coarse_feature``);
  each finer level aligns against the running map. Returns the
  fine->coarse list (or just the finest map for ``SegManaged`` when
  ``return_all_levels`` is False).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.nn.dcn import DCNv2
from iseg_tpu.ops.resize import resize_image


class FeatureSelectionModule(nn.Module):
    """Channel-attention reweighting + 1x1 projection
    (reference ``fapn.py:11``, SE base ``se.py:7`` with ratio=1,
    use_bias=False, relu)."""

    filters: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="down_conv")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="expand_conv")(s)
        gate = nn.sigmoid(s).astype(x.dtype)
        x = x * gate + x  # SE output + residual (fapn.py:34-36)
        return nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv")(x)


class FeatureAlignment(nn.Module):
    """Align the upsampled coarse map to the fine map with DCNv2 whose
    offsets are predicted from ``concat([FSM(fine), 2*coarse_up])``
    (reference ``fapn.py:44-77``)."""

    filters: int
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine, coarse, train: bool = False):
        feats_up = resize_image(
            coarse, (fine.shape[1], fine.shape[2]), "bilinear")
        feats_arm = FeatureSelectionModule(
            filters=self.filters, dtype=self.dtype,
            param_dtype=self.param_dtype, name="lateral_conv")(fine)
        feats_up = feats_up.astype(feats_arm.dtype)

        offset = jnp.concatenate([feats_arm, feats_up * 2], axis=-1)
        offset = nn.Conv(self.filters, (1, 1), use_bias=False,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="offset_conv")(offset)

        aligned = DCNv2(
            filters=self.filters, kernel_size=3, use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="depack_l2",
        )(feats_up, offset_input=offset, train=train)
        return nn.relu(aligned) + feats_arm


class FeatureAlignedPyramidNet(nn.Module):
    """endpoints (fine->coarse) -> aligned pyramid
    (reference ``fapn.py:80``). The coarsest level passes through raw
    unless ``warp_coarse_feature``."""

    filters: int = 128  # reference skip_conv_filters (default 256 there)
    num_levels: int = 4
    warp_coarse_feature: bool = False
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32
    return_all_levels: bool = False

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        from iseg_tpu.nn.heads.common import select_pyramid_endpoints

        feats = select_pyramid_endpoints(endpoints, self.num_levels)
        x = feats[-1]
        if self.warp_coarse_feature:
            x = nn.Dense(self.filters, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="coarse_warp_conv")(x)
        outs = [x]
        for i in range(len(feats) - 2, -1, -1):
            x = FeatureAlignment(
                filters=self.filters, norm=self.norm, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"align{i}",
            )(feats[i], x, train=train)
            outs.append(x)
        outs.reverse()
        if self.return_all_levels:
            return outs
        return outs[0]


FAPN = FeatureAlignedPyramidNet
