"""FaPN: Feature-aligned Pyramid Network head.

Parity with the reference ``layers/fapn.py`` (``FeatureSelectionModule``
:11, DCNv2-based ``FeatureAlignment`` :44, ``FeatureAlignedPyramidNet``
:80): top-down pyramid where each upsampled coarse map is warped by a
deformable conv whose offsets come from the concatenation with the selected
fine map.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.nn.conv import ConvNormAct
from iseg_tpu.nn.dcn import DCNv2
from iseg_tpu.ops.resize import resize_image


class FeatureSelectionModule(nn.Module):
    """Channel-attention reweighting + 1x1 projection
    (reference ``fapn.py:11``)."""

    filters: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        attn = jnp.mean(x, axis=(1, 2), keepdims=True)
        attn = nn.Conv(x.shape[-1], (1, 1), use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="attn")(attn)
        x = x * nn.sigmoid(attn) + x
        return nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="project")(x)


class FeatureAlignment(nn.Module):
    """Align the upsampled coarse map to the fine map with DCNv2 whose
    offsets are predicted from their concat (reference ``fapn.py:44``)."""

    filters: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine, coarse_up, train: bool = False):
        cat = jnp.concatenate([fine, coarse_up.astype(fine.dtype)], axis=-1)
        aligned = DCNv2(
            filters=self.filters, kernel_size=3,
            dtype=self.dtype, param_dtype=self.param_dtype, name="align_dcn",
        )(cat, train=train)
        return nn.relu(aligned) + coarse_up.astype(aligned.dtype)


class FeatureAlignedPyramidNet(nn.Module):
    """endpoints (fine->coarse) -> fused finest-level feature
    (reference ``fapn.py:80``)."""

    filters: int = 128
    num_levels: int = 4
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        from iseg_tpu.nn.heads.common import select_pyramid_endpoints

        feats = select_pyramid_endpoints(endpoints, self.num_levels)
        # coarsest level: plain projection
        x = ConvNormAct(filters=self.filters, kernel_size=1, norm=self.norm,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="top_project")(feats[-1], train=train)
        for i in range(len(feats) - 2, -1, -1):
            fine = FeatureSelectionModule(
                filters=self.filters, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"fsm{i}",
            )(feats[i])
            up = resize_image(x, (fine.shape[1], fine.shape[2]), "bilinear")
            x = FeatureAlignment(
                filters=self.filters, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"align{i}",
            )(fine, up, train=train)
            x = x + fine
        return x


FAPN = FeatureAlignedPyramidNet
