"""Foundational conv blocks.

Parity with the reference's ``layers/model_builder.py``: ``ConvNormAct``
(:34), ``SepConvBnReLU`` (:118), ``NormConvAct`` (:175). NHWC + HWIO —
the layouts XLA maps directly onto the MXU without transposes.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.nn.norm import normalization, resolve_bn_epsilon, resolve_bn_momentum

Activation = Union[str, Callable, None]


def _resolve_act(act: Activation) -> Optional[Callable]:
    if act is None or callable(act):
        return act
    table = {
        "relu": nn.relu,
        "relu6": lambda x: jnp.minimum(nn.relu(x), 6.0),
        # keras/tf gelu defaults to the exact erf form (the reference's
        # activations are keras-default); flax defaults to tanh-approx
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "silu": nn.silu,
        "swish": nn.silu,
        "sigmoid": nn.sigmoid,
        "tanh": nn.tanh,
        "hard_swish": nn.hard_swish,
        "hard_sigmoid": nn.hard_sigmoid,
        "linear": None,
        "none": None,
    }
    if act not in table:
        raise ValueError(f"unknown activation: {act!r}")
    return table[act]


def _bn_kwargs(norm: str, train: bool,
               bn_momentum: float = 0.99, bn_epsilon: float = 1e-3) -> dict:
    """BN constructor kwargs honoring the global set_bn_momentum/
    set_bn_epsilon overrides (norm.py's contract: the knob re-tunes EVERY
    BN layer, including depthwise/pre-norm variants)."""
    if "batch_norm" in norm or norm in ("bn", "syncbn", "sync_bn"):
        return dict(
            momentum=resolve_bn_momentum(bn_momentum),
            epsilon=resolve_bn_epsilon(bn_epsilon),
            use_running_average=not train,
        )
    return {}


def _pair(v) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)  # type: ignore[return-value]


class ConvNormAct(nn.Module):
    """conv -> norm -> activation (reference ``layers/model_builder.py:34``)."""

    filters: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    padding: str = "SAME"
    norm: Optional[str] = "sync_batch_norm"
    act: Activation = "relu"
    use_bias: Optional[bool] = None  # default: bias only when no norm
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = None
    param_dtype: Any = jnp.float32
    name_conv: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.use_bias if self.use_bias is not None else self.norm is None
        x = nn.Conv(
            features=self.filters,
            kernel_size=_pair(self.kernel_size),
            strides=_pair(self.strides),
            kernel_dilation=_pair(self.dilation),
            feature_group_count=self.groups,
            padding=self.padding,
            use_bias=use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=self.name_conv,
        )(x)
        if self.norm is not None:
            norm_ctor = normalization(
                self.norm, dtype=self.dtype, param_dtype=self.param_dtype
            )
            kwargs = _bn_kwargs(self.norm, train,
                                self.bn_momentum, self.bn_epsilon)
            x = norm_ctor(name="norm", **kwargs)(x)
        act = _resolve_act(self.act)
        if act is not None:
            x = act(x)
        return x


class NormConvAct(nn.Module):
    """norm -> conv -> activation (reference ``layers/model_builder.py:175``,
    with BN/LN/GN/RMSN selectable)."""

    filters: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    dilation: Union[int, Sequence[int]] = 1
    padding: str = "SAME"
    norm: Optional[str] = "sync_batch_norm"
    act: Activation = "relu"
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm is not None:
            norm_ctor = normalization(
                self.norm, dtype=self.dtype, param_dtype=self.param_dtype
            )
            kwargs = _bn_kwargs(self.norm, train)
            x = norm_ctor(name="norm", **kwargs)(x)
        x = nn.Conv(
            features=self.filters,
            kernel_size=_pair(self.kernel_size),
            strides=_pair(self.strides),
            kernel_dilation=_pair(self.dilation),
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        act = _resolve_act(self.act)
        if act is not None:
            x = act(x)
        return x


class SepConvNormAct(nn.Module):
    """Depthwise-separable conv -> norm -> act
    (reference ``layers/model_builder.py:118`` ``SepConvBnReLU``)."""

    filters: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    dilation: Union[int, Sequence[int]] = 1
    padding: str = "SAME"
    norm: Optional[str] = "sync_batch_norm"
    act: Activation = "relu"
    depth_multiplier: int = 1
    norm_between: bool = True  # norm+act between depthwise and pointwise
    # pre-activation form (reference XceptionDepthWiseConv with
    # activation=False, xception_common.py:44-61): act BEFORE the depthwise
    # conv, no act between the norms or after the pointwise
    pre_act: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        if self.pre_act:
            pre = _resolve_act(self.act)
            if pre is not None:
                x = pre(x)
        x = nn.Conv(
            features=in_ch * self.depth_multiplier,
            kernel_size=_pair(self.kernel_size),
            strides=_pair(self.strides),
            kernel_dilation=_pair(self.dilation),
            feature_group_count=in_ch,
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="depthwise",
        )(x)
        act = _resolve_act(self.act)
        if self.norm_between and self.norm is not None:
            norm_ctor = normalization(
                self.norm, dtype=self.dtype, param_dtype=self.param_dtype
            )
            kwargs = _bn_kwargs(self.norm, train)
            x = norm_ctor(name="depthwise_norm", **kwargs)(x)
            if act is not None and not self.pre_act:
                x = act(x)
        x = ConvNormAct(
            filters=self.filters,
            kernel_size=1,
            norm=self.norm,
            act=None if self.pre_act else self.act,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pointwise",
        )(x, train=train)
        return x
