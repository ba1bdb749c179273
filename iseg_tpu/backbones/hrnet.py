"""HRNet backbone (W32 / W48).

Parity with the reference ``backbones/hrnet.py`` (``HRNetW48`` :541,
``HRNetW32`` :551): stem to os4, a bottleneck first stage, then three
multi-resolution stages (2/3/4 parallel branches at os4..os32) with full
cross-resolution fusion after every module. ``return_endpoints`` yields the
four branch outputs (fine -> coarse); otherwise the HRNetV2-style os4
concat of all upsampled branches.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.backbones.resnet import BasicBlock, BottleneckBlock
from iseg_tpu.nn.conv import ConvNormAct
from iseg_tpu.nn.wfold import WFoldedBasicBlock, fold_factor, fold_x, unfold_x
from iseg_tpu.ops.resize import resize_image


class FuseLayer(nn.Module):
    """Full cross-resolution fusion: every output branch sums transformed
    versions of every input branch."""

    out_channels: Sequence[int]
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, branches, train: bool = False):
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)
        # The reference fuse (hrnet.py:289-307) REPLACES x_list[i] with the
        # fused+relu output before computing branch i+1, so coarser outputs
        # consume already-fused finer branches (unlike the original PyTorch
        # HRNet). Mirror that sequential-mutation semantic exactly.
        branches = list(branches)
        for i, out_ch in enumerate(self.out_channels):
            acc = None
            for j, b in enumerate(branches):
                if j == i:
                    h = b
                elif j < i:
                    # downsample j -> i with strided 3x3 convs: inner steps
                    # keep the source width + relu, last step projects to
                    # out_ch with no relu (reference hrnet.py:231-238)
                    h = b
                    for k in range(i - j):
                        last = k == i - j - 1
                        h = ConvNormAct(
                            filters=out_ch if last else b.shape[-1],
                            kernel_size=3, strides=2,
                            act=None if last else "relu",
                            name=f"down{j}_{i}_{k}", **common,
                        )(h, train=train)
                else:
                    # upsample j -> i: 1x1 conv + bilinear with
                    # align_corners=True (reference hrnet.py:303)
                    h = ConvNormAct(filters=out_ch, kernel_size=1, act=None,
                                    name=f"up{j}_{i}", **common)(b, train=train)
                    h = resize_image(h, (branches[i].shape[1], branches[i].shape[2]),
                                     "bilinear", align_corners=True)
                acc = h if acc is None else acc + h.astype(acc.dtype)
            branches[i] = nn.relu(acc)
        return branches


class HRModule(nn.Module):
    """num_branches parallel stacks of 4 basic blocks + a fuse layer."""

    channels: Sequence[int]
    num_blocks: int = 4
    norm: str = "sync_batch_norm"
    w_fold: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, branches, train: bool = False):
        outs = []
        for i, (b, ch) in enumerate(zip(branches, self.channels)):
            h = b
            # thin-channel branches run in the W-folded domain (exact;
            # see nn/wfold.py): 48ch at os4 is otherwise HBM-bound at
            # ~25% of the bandwidth floor from 48->128 lane padding
            fold = (fold_factor(ch, b.shape[2])
                    if self.w_fold and "batch_norm" in self.norm else 0)
            if fold:
                h = fold_x(h, fold)
                for k in range(self.num_blocks):
                    h = WFoldedBasicBlock(
                        filters=ch, fold=fold, bn_epsilon=1e-3,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"branch{i}_block{k}")(h, train=train)
                h = unfold_x(h, fold)
                outs.append(h)
                continue
            for k in range(self.num_blocks):
                h = BasicBlock(filters=ch, bn_epsilon=1e-3, norm=self.norm,
                               dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"branch{i}_block{k}")(h, train=train)
            outs.append(h)
        return FuseLayer(out_channels=self.channels, norm=self.norm,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="fuse")(outs, train=train)


class HRNet(nn.Module):
    width: int = 48
    stage_modules: Sequence[int] = (1, 1, 4, 3)  # modules per stage
    return_endpoints: bool = True
    norm: str = "sync_batch_norm"
    # exact W-folded fast path for thin branches (nn/wfold.py); identical
    # parameters/checkpoints, numerics equal up to fp summation order
    w_fold: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        channels = [w, 2 * w, 4 * w, 8 * w]
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)

        # stem: os4
        x = ConvNormAct(filters=64, kernel_size=3, strides=2, name="stem0",
                        **common)(x, train=train)
        x = ConvNormAct(filters=64, kernel_size=3, strides=2, name="stem1",
                        **common)(x, train=train)

        # stage 1: 4 bottleneck blocks at os4
        for k in range(4):
            x = BottleneckBlock(filters=64, bn_epsilon=1e-3, norm=self.norm,
                                dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"stage1_block{k}")(x, train=train)

        # transitions add one coarser branch per stage
        branches = [
            ConvNormAct(filters=channels[0], kernel_size=3,
                        name="transition1_0", **common)(x, train=train),
            ConvNormAct(filters=channels[1], kernel_size=3, strides=2,
                        name="transition1_1", **common)(x, train=train),
        ]
        for stage_idx, n_modules in enumerate(self.stage_modules[1:], start=2):
            n_branches = len(branches)
            for m in range(n_modules):
                branches = HRModule(
                    channels=channels[:n_branches], norm=self.norm,
                    w_fold=self.w_fold, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"stage{stage_idx}_module{m}",
                )(branches, train=train)
            if stage_idx < len(self.stage_modules):
                branches = branches + [
                    ConvNormAct(
                        filters=channels[n_branches], kernel_size=3, strides=2,
                        name=f"transition{stage_idx}_{n_branches}", **common,
                    )(branches[-1], train=train)
                ]

        # HRNetV2 head: upsample all to os4 (align_corners=True, reference
        # hrnet.py:530) and concat
        target_hw = (branches[0].shape[1], branches[0].shape[2])
        ups = [branches[0]] + [
            resize_image(b, target_hw, "bilinear",
                         align_corners=True).astype(branches[0].dtype)
            for b in branches[1:]
        ]
        y = jnp.concatenate(ups, axis=-1)

        if self.return_endpoints:
            # reference hrnet.py:535-536: the four branches + the concat
            return list(branches) + [y]
        return y


@register_backbone("hrnet_w32")
def hrnet_w32(output_stride: int = 4, return_endpoints: bool = True, **kwargs):
    del output_stride  # HRNet keeps os4 natively; no atrous rewrite needed
    return HRNet(width=32, return_endpoints=return_endpoints, **kwargs)


@register_backbone("hrnet_w48")
def hrnet_w48(output_stride: int = 4, return_endpoints: bool = True, **kwargs):
    del output_stride
    return HRNet(width=48, return_endpoints=return_endpoints, **kwargs)
