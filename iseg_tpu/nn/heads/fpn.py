"""Feature Pyramid Network + Semantic-FPN blocks.

Parity with the reference ``layers/fpn.py``:

- ``FeaturePyramidNetwork`` (:16): 1x1 ConvNormAct skip per non-coarsest
  level, top-down bilinear resize + add; the COARSEST level passes through
  raw (no lateral, no smooth convs). Returns the fine->coarse list.
- ``SemanticPyramidNetworkBlock_V1`` (:64): per-level cell of two 3x3
  ConvNormActs, resize-to-finest, concat, 3x3 merge conv of
  ``num_levels * filters`` channels.
- ``SemanticPyramidNetworkBlock_V2`` (:115): level ``i`` gets
  ``max(1, i)`` 3x3 convs, each followed (for i>0) by a resize one pyramid
  step finer; the per-level results sum and pass a 1x1 end conv.

``SemanticFPN`` is the composed convenience head (FPN -> V2 block ->
single finest-level map) used by the example drivers.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.nn.conv import ConvNormAct
from iseg_tpu.ops.numerics import replace_non_finite
from iseg_tpu.ops.resize import resize_image


class FeaturePyramidNetwork(nn.Module):
    """endpoints (fine->coarse) -> pyramid list (fine->coarse).

    Reference-exact (``layers/fpn.py:40-61``): the coarsest endpoint is
    returned RAW (its own channel count); each finer level is
    ``resize(x) + ConvNormAct_1x1(skip)`` with ``filters`` channels.
    """

    filters: int = 256
    num_levels: int = 4  # use the last num_levels endpoints
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        from iseg_tpu.nn.heads.common import select_pyramid_endpoints

        feats = select_pyramid_endpoints(endpoints, self.num_levels)
        common = dict(norm=self.norm, dtype=self.dtype,
                      param_dtype=self.param_dtype)

        x = feats[-1]
        outs = [x]
        for i in range(len(feats) - 2, -1, -1):
            # reference ConvNormAct defaults: 1x1 conv (no bias) + BN + relu;
            # skip features pass replace_nan_or_inf first (fpn.py:51)
            skip = replace_non_finite(feats[i])
            skip = ConvNormAct(filters=self.filters, kernel_size=1,
                               act="relu", name=f"skip_conv{i}",
                               **common)(skip, train=train)
            up = resize_image(x, (skip.shape[1], skip.shape[2]), "bilinear")
            x = up.astype(skip.dtype) + skip
            outs.append(x)
        outs.reverse()
        return outs


class SemanticPyramidNetworkBlockV1(nn.Module):
    """Reference ``layers/fpn.py:64``: two-conv cell per level, resize all
    to the finest, concat, 3x3 merge conv."""

    filters: int = 128
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_list, train: bool = False):
        common = dict(norm=self.norm, dtype=self.dtype,
                      param_dtype=self.param_dtype)
        ys = []
        for i, f in enumerate(feature_list):
            h = ConvNormAct(filters=self.filters, kernel_size=3, act="relu",
                            name=f"cell{i}_conv0", **common)(f, train=train)
            h = ConvNormAct(filters=self.filters, kernel_size=3, act="relu",
                            name=f"cell{i}_conv1", **common)(h, train=train)
            ys.append(h)
        target_hw = (ys[0].shape[1], ys[0].shape[2])
        ys = [ys[0]] + [resize_image(h, target_hw, "bilinear")
                        for h in ys[1:]]
        y = jnp.concatenate([h.astype(ys[0].dtype) for h in ys], axis=-1)
        return ConvNormAct(filters=len(feature_list) * self.filters,
                           kernel_size=3, act="relu", name="merge_conv",
                           **common)(y, train=train)


class SemanticPyramidNetworkBlockV2(nn.Module):
    """Reference ``layers/fpn.py:115``: level ``i`` runs ``max(1, i)``
    3x3 convs; after conv ``j`` (i>0 only) the map resizes to the size of
    level ``i-j-1`` — a progressive walk down to the finest level. The
    per-level results sum; a 1x1 end conv finishes."""

    filters: int = 128
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_list, train: bool = False):
        common = dict(norm=self.norm, dtype=self.dtype,
                      param_dtype=self.param_dtype)
        sizes = [(f.shape[1], f.shape[2]) for f in feature_list]
        results = []
        for i, f in enumerate(feature_list):
            num_convs = 1 if i == 0 else i
            x = f
            for j in range(num_convs):
                x = ConvNormAct(filters=self.filters, kernel_size=3,
                                act="relu", name=f"s{i}_conv{j}",
                                **common)(x, train=train)
                if i > 0:
                    x = resize_image(x, sizes[i - j - 1], "bilinear")
            results.append(x)
        y = results[0]
        for r in results[1:]:
            y = y + r.astype(y.dtype)
        return ConvNormAct(filters=self.filters, kernel_size=1, act="relu",
                           name="end_conv", **common)(y, train=train)


class SemanticFPN(nn.Module):
    """Convenience head: reference-exact FPN then Semantic block V2,
    returning one finest-level map (what ``SegManaged`` consumes)."""

    filters: int = 256
    fuse_filters: int = 128
    num_levels: int = 4
    version: int = 2  # 1 -> Block V1, 2 -> Block V2
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        from iseg_tpu.nn.heads.common import select_pyramid_endpoints

        common = dict(norm=self.norm, dtype=self.dtype,
                      param_dtype=self.param_dtype)
        feats = list(select_pyramid_endpoints(endpoints, self.num_levels))
        # The reference FPN passes the coarsest endpoint through RAW, so
        # its top-down add only type-checks when that endpoint already has
        # ``filters`` channels. This convenience composition projects it
        # first (the reference leaves that to the caller).
        if feats[-1].shape[-1] != self.filters:
            feats[-1] = ConvNormAct(
                filters=self.filters, kernel_size=1, act=None,
                name="coarse_project", **common)(feats[-1], train=train)
        pyramid = FeaturePyramidNetwork(
            filters=self.filters, num_levels=self.num_levels,
            name="fpn", **common,
        )(feats, train=train)
        block_cls = (SemanticPyramidNetworkBlockV1 if self.version == 1
                     else SemanticPyramidNetworkBlockV2)
        return block_cls(filters=self.fuse_filters, name="semantic_block",
                         **common)(pyramid, train=train)
