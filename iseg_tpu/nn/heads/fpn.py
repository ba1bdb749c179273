"""Feature Pyramid Network + Semantic-FPN head.

Parity with the reference ``layers/fpn.py:16`` ``FeaturePyramidNetwork``
(lateral 1x1 + top-down sum + 3x3 smooth) and its Semantic-FPN blocks
(V1/V2): every pyramid level is progressively upsampled/conv'd to the
finest level and summed into one semantic feature map.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.nn.conv import ConvNormAct
from iseg_tpu.ops.resize import resize_image


class FeaturePyramidNetwork(nn.Module):
    """endpoints (fine->coarse) -> pyramid list (fine->coarse), all with
    ``filters`` channels."""

    filters: int = 256
    num_levels: int = 4  # use the last num_levels endpoints
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        from iseg_tpu.nn.heads.common import select_pyramid_endpoints

        feats = select_pyramid_endpoints(endpoints, self.num_levels)
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)

        laterals = [
            ConvNormAct(filters=self.filters, kernel_size=1, act=None,
                        name=f"lateral{i}", **common)(f, train=train)
            for i, f in enumerate(feats)
        ]
        # top-down pathway (coarse -> fine)
        for i in range(len(laterals) - 2, -1, -1):
            up = resize_image(
                laterals[i + 1], (laterals[i].shape[1], laterals[i].shape[2]),
                "bilinear",
            )
            laterals[i] = laterals[i] + up.astype(laterals[i].dtype)
        outs = [
            ConvNormAct(filters=self.filters, kernel_size=3, act="relu",
                        name=f"smooth{i}", **common)(l, train=train)
            for i, l in enumerate(laterals)
        ]
        return outs


class SemanticFPN(nn.Module):
    """Fuse an FPN pyramid into one finest-level semantic map (Semantic-FPN,
    reference ``layers/fpn.py`` blocks V1/V2)."""

    filters: int = 256
    fuse_filters: int = 128
    num_levels: int = 4
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)
        pyramid = FeaturePyramidNetwork(
            filters=self.filters, num_levels=self.num_levels,
            norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype,
            name="fpn",
        )(endpoints, train=train)

        target_hw = (pyramid[0].shape[1], pyramid[0].shape[2])
        fused = None
        for i, p in enumerate(pyramid):
            # Semantic-FPN structure: one (3x3 conv + norm + act) per 2x
            # stage, each followed by a 2x bilinear upsample — NOT one conv
            # and a single direct jump (the coarsest level is refined at
            # every intermediate scale)
            import math

            n_up = max(0, int(round(math.log2(
                max(target_hw[0] / p.shape[1], target_hw[1] / p.shape[2])))))
            h = p
            for s in range(max(1, n_up)):
                h = ConvNormAct(filters=self.fuse_filters, kernel_size=3,
                                name=f"merge{i}_{s}", **common)(h, train=train)
                if n_up > 0:
                    step_hw = (
                        target_hw if s == n_up - 1  # land exactly (odd sizes)
                        else (min(h.shape[1] * 2, target_hw[0]),
                              min(h.shape[2] * 2, target_hw[1]))
                    )
                    h = resize_image(h, step_hw, "bilinear")
            if h.shape[1:3] != target_hw:
                h = resize_image(h, target_hw, "bilinear")
            fused = h if fused is None else fused + h
        return fused
