"""NAS-FPN head.

Parity with the reference ``layers/nasfpn.py`` (``NASFPN`` :105, block
specs, global-attention combine :309): the discovered 7-merging-cell
architecture over pyramid levels P3-P7. Nodes resample inputs to the target
level (max-pool down / nearest up), combine by sum or global attention,
then relu -> 3x3 conv -> norm.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.nn.conv import ConvNormAct
from iseg_tpu.ops.resize import resize_image

# (output_level, combine_op, (input_node_a, input_node_b), is_output)
# nodes 0..4 are the input pyramid P3..P7; new nodes append after.
# The discovered NAS-FPN cell (Ghiasi et al., CVPR 2019).
NASFPN_BLOCK_SPECS = (
    (4, "attention", (1, 3), False),
    (4, "sum", (1, 5), False),
    (3, "sum", (0, 6), True),
    (4, "sum", (6, 7), True),
    (5, "attention", (7, 2), True),
    (7, "attention", (9, 4), True),
    (6, "attention", (9, 10), True),
)

_MIN_LEVEL = 3


def _resample(x, target_hw):
    h, w = x.shape[1], x.shape[2]
    th, tw = target_hw
    if (h, w) == (th, tw):
        return x
    if h > th:  # downsample via max-pool with matching stride
        stride = max(1, h // th)
        x = nn.max_pool(x, (stride, stride), strides=(stride, stride),
                        padding="SAME")
        if x.shape[1:3] != (th, tw):
            x = resize_image(x, (th, tw), "nearest")
        return x
    return resize_image(x, (th, tw), "nearest")


def _global_attention(a, b):
    """out = a + sigmoid(global_max_pool(a)) * b
    (reference ``nasfpn.py:309``)."""
    m = jnp.max(a, axis=(1, 2), keepdims=True)
    return a + nn.sigmoid(m) * b.astype(a.dtype)


class NASFPN(nn.Module):
    filters: int = 256
    num_repeats: int = 1
    block_specs: Sequence = NASFPN_BLOCK_SPECS
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)
        from iseg_tpu.nn.heads.common import select_pyramid_endpoints

        feats = select_pyramid_endpoints(endpoints, 3)  # os8, os16, os32 -> P3, P4, P5

        # project + extend to P6, P7 by stride-2 pooling
        pyramid = [
            ConvNormAct(filters=self.filters, kernel_size=1, act=None,
                        name=f"in_project{i}", **common)(f, train=train)
            for i, f in enumerate(feats)
        ]
        for i in range(2):
            pyramid.append(
                nn.max_pool(pyramid[-1], (2, 2), strides=(2, 2), padding="SAME")
            )
        level_hw = {lvl: (p.shape[1], p.shape[2])
                    for lvl, p in zip(range(_MIN_LEVEL, _MIN_LEVEL + 5), pyramid)}

        for rep in range(self.num_repeats):
            nodes = list(pyramid)
            outputs = {}
            for spec_idx, (lvl, op, (ia, ib), is_out) in enumerate(self.block_specs):
                target_hw = level_hw[lvl]
                a = _resample(nodes[ia], target_hw)
                b = _resample(nodes[ib], target_hw)
                merged = a + b.astype(a.dtype) if op == "sum" else _global_attention(a, b)
                merged = nn.relu(merged)
                merged = ConvNormAct(
                    filters=self.filters, kernel_size=3, act=None,
                    name=f"r{rep}_node{spec_idx}", **common,
                )(merged, train=train)
                nodes.append(merged)
                if is_out:
                    outputs[lvl] = merged
            pyramid = [outputs.get(lvl, pyramid[lvl - _MIN_LEVEL])
                       for lvl in range(_MIN_LEVEL, _MIN_LEVEL + 5)]

        # finest level is the head feature (P3)
        return pyramid[0]
