"""DeepLabV3+-style low-level-skip decoder
(reference ``layers/simpledecoder.py:8`` ``SimpleDecoder``)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.nn.conv import ConvNormAct
from iseg_tpu.ops.resize import resize_image


class SimpleDecoder(nn.Module):
    """Project a low-level endpoint, upsample the high-level feature to it,
    concat, refine with two 3x3 convs."""

    filters: int = 256
    low_level_filters: int = 48
    low_level_index: int = 1  # endpoint at output-stride 4
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        if not isinstance(endpoints, (list, tuple)):
            endpoints = [endpoints]
        high = endpoints[-1]
        low = endpoints[min(self.low_level_index, len(endpoints) - 1)]

        low = ConvNormAct(
            filters=self.low_level_filters, kernel_size=1, norm=self.norm,
            dtype=self.dtype, param_dtype=self.param_dtype, name="low_level_project",
        )(low, train=train)

        high = resize_image(high, (low.shape[1], low.shape[2]), "bilinear")
        x = jnp.concatenate([high, low.astype(high.dtype)], axis=-1)

        x = ConvNormAct(
            filters=self.filters, kernel_size=3, norm=self.norm,
            dtype=self.dtype, param_dtype=self.param_dtype, name="fuse0",
        )(x, train=train)
        x = ConvNormAct(
            filters=self.filters, kernel_size=3, norm=self.norm,
            dtype=self.dtype, param_dtype=self.param_dtype, name="fuse1",
        )(x, train=train)
        return x
