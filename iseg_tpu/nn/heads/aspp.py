"""Atrous Spatial Pyramid Pooling (DeepLab).

Parity with the reference ``layers/aspp.py:7``
``AtrousSpatialPyramidPooling``: image-pool branch + 1x1 + three 3x3 atrous
convs (rates 6/12/18 at output-stride 16) -> concat -> 1x1 project ->
dropout.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.nn.blocks import ImageLevelBlock
from iseg_tpu.nn.conv import ConvNormAct, SepConvNormAct


class ASPP(nn.Module):
    filters: int = 256
    atrous_rates: Sequence[int] = (6, 12, 18)
    use_separable_conv: bool = False
    dropout_rate: float = 0.1
    use_image_level: bool = True
    # the reference's ASPP (layers/aspp.py:7) returns the raw branch concat
    # with NO projection conv — its drivers project via CommonEndBlock or
    # the logits conv. use_projection=False reproduces that exact shape
    # (used by the train-trajectory parity tests); the default keeps the
    # standard DeepLabV3 1x1 projection.
    use_projection: bool = True
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        x = endpoints[-1] if isinstance(endpoints, (list, tuple)) else endpoints
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)

        branches = []
        if self.use_image_level:
            branches.append(
                ImageLevelBlock(
                    filters=self.filters, norm=self.norm,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="image_pool",
                )(x, train=train)
            )
        branches.append(
            ConvNormAct(filters=self.filters, kernel_size=1, name="conv1x1", **common)(
                x, train=train
            )
        )
        conv_cls = SepConvNormAct if self.use_separable_conv else ConvNormAct
        for i, rate in enumerate(self.atrous_rates):
            branches.append(
                conv_cls(
                    filters=self.filters, kernel_size=3, dilation=rate,
                    name=f"atrous{i}", **common,
                )(x, train=train)
            )

        y = jnp.concatenate([b.astype(branches[-1].dtype) for b in branches], axis=-1)
        if self.use_projection:
            y = ConvNormAct(filters=self.filters, kernel_size=1, name="project",
                            **common)(y, train=train)
        if self.dropout_rate > 0:
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y


# reference class name alias
AtrousSpatialPyramidPooling = ASPP
