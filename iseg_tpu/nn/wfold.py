"""W-axis channel folding: exact repacking of thin-channel NHWC convs.

TPU rationale: the lane (minor-most) dimension of every HBM/VMEM tile is
128, so a 48-channel activation wastes 62% of every memory transaction —
and HRNet's finest branch (48ch at os4, the single hottest unit of
BASELINE config #3) is bandwidth-bound at ~20-25% of the HBM floor for
exactly this reason (tools/probe_hrnet.py). Folding adjacent W columns
into channels raises lane utilization to 75% (48ch -> 96ch) or 100%
(32ch folded twice -> 128ch) at the cost of structured-zero FLOPs the
idle MXU absorbs. Measured on v5e: 0.389 -> 0.276 ms per 48ch fwd+bwd
conv, 3.815 -> 2.343 ms per 4-block branch unit.

The transform is EXACT (not an approximation): a stride-1 3x3 SAME conv
on ``(N, H, W, C)`` equals a stride-1 3x3 SAME conv on
``(N, H, W/2, 2C)`` with a block-structured kernel. Derivation: writing a
fine column index as ``w = 2q + b`` (block ``q``, phase ``b``), the tap
``w + dw = 2(q + e) + b'`` with ``b' = (b + dw) mod 2`` maps each
``(b, dw)`` to exactly one block-space tap ``(e, b')``, so the folded
kernel is 3-wide with half of its ``(b', b)`` channel blocks zero.
Folding is an order-preserving reshape (``(..., W, C) -> (..., W/2,
2C)``), applying it twice folds by 4, and ``fold_kernel`` composes the
same way. BatchNorm stays exact by reducing moments over the phase
sub-axis as well (``FoldedBatchNorm``), so per-logical-channel statistics
are identical to the unfolded path.

The reference runs these branches as plain NHWC convs
(``backbones/hrnet.py:541``); this module is the TPU-native fast path
used by :mod:`iseg_tpu.backbones.hrnet` — parameters keep the canonical
unfolded shapes and names, so checkpoints, weight maps, and parity tests
are unaffected.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from iseg_tpu.nn.norm import resolve_bn_epsilon, resolve_bn_momentum


def fold_factor(channels: int, width: int, target: int = 128) -> int:
    """Largest k with ``channels * 2**k <= target`` and ``2**k | width``
    (0 when channels already fill >= 3/4 of a lane tile)."""
    k = 0
    while (channels << (k + 1)) <= target and width % (1 << (k + 1)) == 0:
        k += 1
    return k


def fold_x(x: jax.Array, k: int = 1) -> jax.Array:
    """(N, H, W, C) -> (N, H, W/2**k, C*2**k); order-preserving reshape."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w >> k, c << k)


def unfold_x(x: jax.Array, k: int = 1) -> jax.Array:
    n, h, q, cf = x.shape
    return x.reshape(n, h, q << k, cf >> k)


def _fold_kernel_once(w: jax.Array) -> jax.Array:
    """(kh, 3, ci, co) -> (kh, 3, 2ci, 2co) block kernel (see module doc)."""
    z = jnp.zeros_like(w[:, 0])
    w0, w1, w2 = w[:, 0], w[:, 1], w[:, 2]

    def blk(a, b, c, d):  # [[a, b], [c, d]] over (ci, co) blocks
        return jnp.concatenate(
            [jnp.concatenate([a, b], axis=2), jnp.concatenate([c, d], axis=2)],
            axis=1,
        )

    return jnp.stack(
        [blk(z, z, w0, z), blk(w1, w0, w2, w1), blk(z, w2, z, z)], axis=1
    )


def fold_kernel(w: jax.Array, k: int = 1) -> jax.Array:
    """(kh, 3, C, C) conv kernel -> its 2**k-fold W-block equivalent."""
    for _ in range(k):
        w = _fold_kernel_once(w)
    return w


class FoldedBatchNorm(nn.Module):
    """BatchNorm over a W-folded activation with EXACT per-logical-channel
    moments: the reduction includes the phase sub-axis, running stats and
    scale/bias keep the canonical ``(features,)`` shape (so the variable
    tree matches :class:`iseg_tpu.nn.norm.BatchNorm` exactly)."""

    features: int
    fold: int
    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = 1 << self.fold
        assert x.shape[-1] == self.features * f, (x.shape, self.features, f)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (self.features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (self.features,))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            # heavy reduction stays in the folded layout; the phase
            # combine happens on (f, C) vectors, which is free
            m_f = jnp.mean(xf, axis=(0, 1, 2))
            m2_f = jnp.mean(xf * xf, axis=(0, 1, 2))
            mean = m_f.reshape(f, self.features).mean(axis=0)
            var = m2_f.reshape(f, self.features).mean(axis=0) - mean * mean
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        # flax BatchNorm promotion: explicit dtype wins, else promote with
        # the fp32 scale/bias (so dtype=None normalizes in fp32)
        dt = self.dtype or jnp.promote_types(x.dtype, self.param_dtype)
        mul = (jax.lax.rsqrt(var + self.epsilon)
               * scale.astype(jnp.float32))
        mul_t = jnp.tile(mul, f).astype(dt)
        mean_t = jnp.tile(mean, f).astype(dt)
        bias_t = jnp.tile(bias.astype(jnp.float32), f).astype(dt)
        return (x.astype(dt) - mean_t) * mul_t + bias_t


class _FoldedConvKernel(nn.Module):
    """Holds the canonical (3, 3, C, C) kernel under the child name
    ``conv`` so the param path matches ``ConvNormAct``'s ``conv/kernel``;
    returns its 2**fold-folded equivalent."""

    features: int
    fold: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.features, self.features), self.param_dtype)
        return fold_kernel(kernel, self.fold)


class _FoldedConvBN(nn.Module):
    """conv3x3(SAME, stride 1) + BN (+ optional relu) on a W-folded
    activation; variable tree identical to ``ConvNormAct`` (``conv/kernel``
    + ``norm/{scale,bias}`` + ``batch_stats norm/{mean,var}``)."""

    features: int
    fold: int
    act: bool = True
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kf = _FoldedConvKernel(features=self.features, fold=self.fold,
                               param_dtype=self.param_dtype, name="conv")()
        # same promotion rule as nn.Conv: explicit dtype wins, otherwise
        # promote input/kernel to their common type (fp32 params + bf16
        # input -> fp32, matching the unfolded path)
        dt = self.dtype or jnp.promote_types(x.dtype, kf.dtype)
        kf = kf.astype(dt)
        x = x.astype(dt)
        y = jax.lax.conv_general_dilated(
            x, kf, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = FoldedBatchNorm(
            features=self.features, fold=self.fold,
            use_running_average=not train,
            momentum=resolve_bn_momentum(self.bn_momentum),
            epsilon=resolve_bn_epsilon(self.bn_epsilon),
            dtype=self.dtype, param_dtype=self.param_dtype, name="norm")(y)
        return nn.relu(y) if self.act else y


class WFoldedBasicBlock(nn.Module):
    """Identity-shortcut BasicBlock (two 3x3 convs) computed entirely in
    the W-folded domain. Parameter tree and numerics (up to fp summation
    order) match :class:`iseg_tpu.backbones.resnet.BasicBlock` with
    ``stride=1`` and matching channels — the only configuration HRNet's
    branch stacks use."""

    filters: int
    fold: int
    bn_epsilon: float = 1e-3
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        common = dict(features=self.filters, fold=self.fold,
                      bn_epsilon=self.bn_epsilon, dtype=self.dtype,
                      param_dtype=self.param_dtype)
        h = _FoldedConvBN(act=True, name="conv1", **common)(x, train=train)
        h = _FoldedConvBN(act=False, name="conv2", **common)(h, train=train)
        return nn.relu(h + x)
