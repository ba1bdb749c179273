"""Modern ResNet family (9/10/18/50/52/101/103/152).

Parity with the reference's ``backbones/resnet_common.py`` (``ResNet`` :187,
``get_resnet`` :490, stack styles ``Stack`` :25 / slim ``Stack2`` :94,
7x7->3x3 deep-stem replacement :245, atrous conversion :561-588, multi-grid
:591-598) + ``resnet_blocks.py`` / ``resnet_blocks_small.py``.

TPU-first: dilation is a construction-time parameter derived from
``output_stride`` (the reference mutates built models post-hoc); multi-grid
multiplies the last stage's per-block dilations exactly like
``apply_multi_grid`` (:591-598).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.nn.conv import ConvNormAct

_BN_EPS = 1.001e-5


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dilation: int = 1
    conv_shortcut: Optional[bool] = None
    bn_epsilon: float = _BN_EPS  # keras-applications default; HRNet uses 1e-3
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        h = ConvNormAct(
            filters=self.filters, kernel_size=3, strides=self.stride,
            dilation=self.dilation, norm=self.norm, act="relu",
            bn_epsilon=self.bn_epsilon, dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv1",
        )(x, train=train)
        h = ConvNormAct(
            filters=self.filters, kernel_size=3, dilation=self.dilation,
            norm=self.norm, act=None, bn_epsilon=self.bn_epsilon,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv2",
        )(h, train=train)
        use_conv_shortcut = self.conv_shortcut
        if use_conv_shortcut is None:
            use_conv_shortcut = (
                self.stride != 1 or shortcut.shape[-1] != self.filters)
        if use_conv_shortcut:
            shortcut = ConvNormAct(
                filters=self.filters, kernel_size=1, strides=self.stride,
                norm=self.norm, act=None, bn_epsilon=self.bn_epsilon,
                dtype=self.dtype, param_dtype=self.param_dtype, name="shortcut",
            )(shortcut, train=train)
        elif self.stride != 1:
            shortcut = nn.avg_pool(
                shortcut, (self.stride, self.stride),
                strides=(self.stride, self.stride), padding="SAME")
        return nn.relu(h + shortcut)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) bottleneck, stride on the 3x3 (reference
    ``BlockType2`` ``resnet_blocks.py:112``). ``conv_shortcut`` None = auto
    (conv projection when stride or channel change); the slim stacks pass
    False on stride blocks, where the identity path downsamples with an
    avg-pool instead (``resnet_blocks.py:184-190``)."""

    filters: int
    stride: int = 1
    dilation: int = 1
    conv_shortcut: Optional[bool] = None
    bn_epsilon: float = _BN_EPS  # keras-applications default; HRNet uses 1e-3
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        out_ch = self.filters * 4
        use_conv_shortcut = self.conv_shortcut
        if use_conv_shortcut is None:
            use_conv_shortcut = self.stride != 1 or x.shape[-1] != out_ch

        h = ConvNormAct(
            filters=self.filters, kernel_size=1, norm=self.norm, act="relu",
            bn_epsilon=self.bn_epsilon, dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv1",
        )(x, train=train)
        h = ConvNormAct(
            filters=self.filters, kernel_size=3, strides=self.stride,
            dilation=self.dilation, norm=self.norm, act="relu",
            bn_epsilon=self.bn_epsilon, dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv2",
        )(h, train=train)
        h = ConvNormAct(
            filters=out_ch, kernel_size=1, norm=self.norm, act=None,
            bn_epsilon=self.bn_epsilon, dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv3",
        )(h, train=train)
        if use_conv_shortcut:
            shortcut = ConvNormAct(
                filters=out_ch, kernel_size=1, strides=self.stride,
                norm=self.norm, act=None, bn_epsilon=self.bn_epsilon,
                dtype=self.dtype, param_dtype=self.param_dtype, name="shortcut",
            )(shortcut, train=train)
        elif self.stride != 1:
            # parameter-free identity downsample (reference slim blocks)
            shortcut = nn.avg_pool(
                shortcut, (self.stride, self.stride),
                strides=(self.stride, self.stride), padding="SAME")
        return nn.relu(h + shortcut)


class ResNet(nn.Module):
    """Input-size-free ResNet returning endpoints at os 2/4/8/16/32(or
    dilated) (reference ``resnet_common.py:187``)."""

    depths: Sequence[int] = (3, 4, 6, 3)
    use_bottleneck: bool = True
    output_stride: int = 32
    multi_grid: Optional[Sequence[int]] = None  # e.g. (1, 2, 4)
    deep_stem: bool = False  # 7x7 -> 3x 3x3 (reference :245)
    # slim/TF-slim stack style (reference ``Stack2`` :94,
    # ``slim_behaviour``): the stage's downsampling stride sits on the LAST
    # block, and endpoints tap the pre-stride activation
    slim_stack: bool = False
    stem_filters: int = 64
    # deep-stem width scale (reference ``conv1_depth_multiplier``,
    # ``resnet_common.py:246``; 0.5 for resnet9/10)
    stem_depth_multiplier: float = 1.0
    return_endpoints: bool = True
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = []
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)

        # stem (os 2)
        if self.deep_stem:
            # reference build_3x3_resnet (resnet_common.py:246-276):
            # 64m s2 -> 64m -> 128m
            m = self.stem_depth_multiplier
            x = ConvNormAct(filters=int(64 * m), kernel_size=3, strides=2,
                            bn_epsilon=_BN_EPS, name="stem0", **common)(x, train=train)
            x = ConvNormAct(filters=int(64 * m), kernel_size=3,
                            bn_epsilon=_BN_EPS, name="stem1", **common)(x, train=train)
            x = ConvNormAct(filters=int(128 * m), kernel_size=3,
                            bn_epsilon=_BN_EPS, name="stem2", **common)(x, train=train)
        else:
            x = ConvNormAct(filters=self.stem_filters, kernel_size=7, strides=2,
                            bn_epsilon=_BN_EPS, name="stem", **common)(x, train=train)
        endpoints.append(x)

        # max-pool to os 4
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        block_cls = BottleneckBlock if self.use_bottleneck else BasicBlock
        current_stride = 4
        dilation = 1
        stage_filters = (64, 128, 256, 512)

        if self.slim_stack:
            # stride-last stacks (reference Stack2 :94): block n of each
            # non-final stage downsamples; endpoints tap pre-stride features
            num_stages = len(self.depths)
            for stage_idx, (depth, filters) in enumerate(
                zip(self.depths, stage_filters)
            ):
                is_last_stage = stage_idx == num_stages - 1
                grid = (
                    list(self.multi_grid)
                    if (is_last_stage and self.multi_grid)
                    else [1] * depth
                )
                for i in range(depth):
                    wants_stride = i == depth - 1 and not is_last_stage
                    if wants_stride:
                        endpoints.append(x)
                        if current_stride >= self.output_stride:
                            stride = 1
                            # the de-strided block itself runs at the
                            # DOUBLED rate (reference build_atrous_resnet
                            # resnet_common.py:577-581)
                            dilation *= 2
                        else:
                            stride = 2
                            current_stride *= 2
                    else:
                        stride = 1
                    rate = dilation * grid[i % len(grid)]
                    x = block_cls(
                        filters=filters, stride=stride, dilation=rate,
                        # conv projection only on each stage's first block;
                        # slim stride blocks use the avg-pool identity
                        # (reference Stack2 resnet_common.py:113-148)
                        conv_shortcut=(i == 0),
                        name=f"stage{stage_idx}_block{i}", **common,
                    )(x, train=train)
            endpoints.append(x)
            if self.return_endpoints:
                return endpoints
            return x

        for stage_idx, (depth, filters) in enumerate(zip(self.depths, stage_filters)):
            stage_stride = 1 if stage_idx == 0 else 2
            if stage_idx > 0:
                # endpoint taps stay fixed whether or not the stage is
                # dilated, matching the reference's rewrite semantics
                endpoints.append(x)
                if current_stride >= self.output_stride:
                    dilation *= stage_stride  # atrous rewrite (:561-588)
                    stage_stride = 1
                else:
                    current_stride *= 2

            is_last = stage_idx == len(self.depths) - 1
            grid = (
                list(self.multi_grid)
                if (is_last and self.multi_grid)
                else [1] * depth
            )
            for block_idx in range(depth):
                rate = dilation * grid[block_idx % len(grid)]
                x = block_cls(
                    filters=filters,
                    stride=stage_stride if block_idx == 0 else 1,
                    dilation=rate,
                    name=f"stage{stage_idx}_block{block_idx}",
                    **common,
                )(x, train=train)

        endpoints.append(x)
        if self.return_endpoints:
            return endpoints
        return x


_CONFIGS = {
    # name: (depths, bottleneck, stem_multiplier)
    # All reference resnets are built deep-stem + slim by default
    # (feature_extractor.py:58-66 forces replace_7x7_conv=True,
    # slim_behaviour=True, use_bias=False); the published weights match
    # that configuration. resnet52/103 are the reference's aliases for the
    # same constructors (feature_extractor.py:84-86).
    "resnet9": ((1, 1, 1, 1), False, 0.5),
    "resnet10": ((1, 1, 1, 1), False, 0.5),
    "resnet18": ((2, 2, 2, 2), False, 1.0),
    "resnet50": ((3, 4, 6, 3), True, 1.0),
    "resnet52": ((3, 4, 6, 3), True, 1.0),
    "resnet101": ((3, 4, 23, 3), True, 1.0),
    "resnet103": ((3, 4, 23, 3), True, 1.0),
    "resnet152": ((3, 8, 36, 3), True, 1.0),
}


def _make_ctor(name, depths, bottleneck, stem_mult):
    def ctor(output_stride=32, return_endpoints=True, multi_grid=(1, 2, 4),
             deep_stem=True, slim_stack=True, **kwargs):
        # the reference applies multi-grid unconditionally to the last
        # stage (feature_extractor.py:141 apply_multi_grid grids=[1,2,4])
        return ResNet(
            depths=depths,
            use_bottleneck=bottleneck,
            deep_stem=deep_stem,
            slim_stack=slim_stack,
            stem_depth_multiplier=stem_mult,
            output_stride=output_stride,
            multi_grid=multi_grid,
            return_endpoints=return_endpoints,
            **kwargs,
        )

    ctor.__name__ = name
    return ctor


for _name, (_depths, _bneck, _mult) in _CONFIGS.items():
    register_backbone(_name, _make_ctor(_name, _depths, _bneck, _mult))
