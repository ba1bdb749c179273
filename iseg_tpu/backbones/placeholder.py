"""Identity backbone for head-only models
(reference ``backbones/placeholder.py:5`` ``PlaceHolder``)."""

from __future__ import annotations

import flax.linen as nn

from iseg_tpu.backbones.registry import register_backbone


class PlaceHolder(nn.Module):
    return_endpoints: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.return_endpoints:
            return [x]
        return x


@register_backbone("placeholder")
def placeholder(output_stride: int = 1, return_endpoints: bool = True, **kwargs):
    del output_stride
    return PlaceHolder(return_endpoints=return_endpoints, **kwargs)
