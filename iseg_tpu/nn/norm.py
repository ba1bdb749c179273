"""Normalization layers + factory.

Parity with the reference's ``layers/normalizations.py:39`` ``normalization``
factory (global default = SyncBN, ``:34-36``), ``layers/syncbn.py:20`` and
the Keras-3 synchronized BN patch (``layers/keras3/bn.py:76``).

TPU-first: under a GSPMD-jitted train step the batch axis is sharded over
the ``data`` mesh axis, so plain global-batch moments ARE synchronized
batch-norm — XLA inserts the ICI all-reduces the reference issues by hand
via ``all_reduce_values`` (``layers/keras3/bn.py:46-48``). ``axis_name`` is
still exposed for shard_map/pmap code paths. Moment math is done in fp32
regardless of compute dtype, matching the reference's upcast
(``layers/keras3/bn.py:10-30``, ``layers/syncbn.py:77``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

# Module-level default, mirroring the reference's global norm default
# (``layers/normalizations.py:34-36``).
_DEFAULT_NORM = "sync_batch_norm"


def set_default_norm(kind: str) -> None:
    global _DEFAULT_NORM
    _DEFAULT_NORM = kind


# Global BN momentum override (None = per-layer defaults). The reference
# exposes the same knob post-restore via ``utils/keras_ops.py:80-99``
# ``set_bn_momentum`` / ``set_bn_epsilon``; here modules read it at
# construction (inside ``apply``), so setting it before building/applying a
# model re-tunes every BN layer.
_BN_MOMENTUM_OVERRIDE: float | None = None
_BN_EPSILON_OVERRIDE: float | None = None


def set_bn_momentum(momentum: float | None) -> None:
    global _BN_MOMENTUM_OVERRIDE
    _BN_MOMENTUM_OVERRIDE = momentum


def set_bn_epsilon(epsilon: float | None) -> None:
    global _BN_EPSILON_OVERRIDE
    _BN_EPSILON_OVERRIDE = epsilon


def resolve_bn_momentum(default: float) -> float:
    return _BN_MOMENTUM_OVERRIDE if _BN_MOMENTUM_OVERRIDE is not None else default


def resolve_bn_epsilon(default: float) -> float:
    return _BN_EPSILON_OVERRIDE if _BN_EPSILON_OVERRIDE is not None else default


class BatchNorm(nn.BatchNorm):
    """BatchNorm with Keras-default momentum/epsilon.

    Defaults momentum=0.99, epsilon=1e-3 match
    ``keras.layers.BatchNormalization`` as used throughout the reference;
    backbones override per family. Moments promote to fp32 under a bf16
    compute dtype (reference upcast: ``layers/keras3/bn.py:10-30``).
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    use_running_average: Optional[bool] = None


class SyncBatchNorm(BatchNorm):
    """Cross-replica BN (reference ``layers/syncbn.py:20``).

    Identical to :class:`BatchNorm` under GSPMD jit (global-batch moments
    are already cross-replica); set ``axis_name="data"`` inside shard_map /
    pmap to reduce moments explicitly like the reference's triple
    ``all_reduce`` (``layers/syncbn.py:91-93``).
    """


class GroupNorm(nn.GroupNorm):
    """GroupNorm (reference ``layers/groupnorm.py:18``)."""

    num_groups: int = 32
    epsilon: float = 1e-5


class LayerNorm(nn.LayerNorm):
    epsilon: float = 1e-6


class RMSNorm(nn.RMSNorm):
    """RMSNorm (reference ``layers/rmsnorm.py:7``)."""

    epsilon: float = 1e-6


def normalization(
    kind: str | None = None,
    *,
    dtype: Any = None,
    param_dtype: Any = jnp.float32,
    axis_name: str | None = None,
    **kwargs,
) -> Callable[..., nn.Module]:
    """Factory returning a norm-module constructor.

    Parity with reference ``layers/normalizations.py:39``. ``kind`` in
    {"batch_norm", "sync_batch_norm", "group_norm", "layer_norm",
    "rms_norm", None}; None uses the global default (SyncBN).
    """
    if kind is None:
        kind = _DEFAULT_NORM

    common = dict(dtype=dtype, param_dtype=param_dtype, **kwargs)
    if kind in ("batch_norm", "bn"):
        return functools.partial(BatchNorm, **common)
    if kind in ("sync_batch_norm", "syncbn", "sync_bn"):
        return functools.partial(SyncBatchNorm, axis_name=axis_name, **common)
    if kind in ("group_norm", "gn"):
        return functools.partial(GroupNorm, **common)
    if kind in ("layer_norm", "ln"):
        return functools.partial(LayerNorm, **common)
    if kind in ("rms_norm", "rmsn"):
        return functools.partial(RMSNorm, **common)
    raise ValueError(f"unknown normalization kind: {kind!r}")
