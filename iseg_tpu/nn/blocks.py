"""Misc reusable blocks: drop-path, SE, image-level pooling, head-end block,
gradient scaling, adaptive pooling.

Parity: ``layers/model_builder.py:253`` (ImageLevelBlock), ``:276``
(CommonEndBlock), ``:307`` (drop_connect), ``layers/se.py:7``,
``layers/dense_ext.py:13``, ``layers/grads_scaler.py:3``,
``layers/poolings.py:13``, ``backbones/convnext_v2.py:17`` (GRN).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from iseg_tpu.nn.conv import ConvNormAct, _resolve_act
from iseg_tpu.ops.resize import resize_image


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference ``model_builder.py:307``
    ``drop_connect``). Identity in eval or when rate == 0."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class SqueezeExcite(nn.Module):
    """Squeeze-and-Excitation (reference ``layers/se.py:7``)."""

    reduction_filters: int
    gate_act: str = "sigmoid"
    inner_act: str = "silu"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(
            self.reduction_filters, (1, 1), use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="reduce",
        )(s)
        s = _resolve_act(self.inner_act)(s)
        s = nn.Conv(
            c, (1, 1), use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="expand",
        )(s)
        s = _resolve_act(self.gate_act)(s)
        return x * s


class ImageLevelBlock(nn.Module):
    """Global-pool branch: pool -> 1x1 ConvNormAct -> broadcast back to the
    input resolution (reference ``layers/model_builder.py:253``)."""

    filters: int
    norm: Optional[str] = "sync_batch_norm"
    act: str = "relu"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvNormAct(
            filters=self.filters, kernel_size=1, norm=self.norm, act=self.act,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(pooled, train=train)
        return jnp.broadcast_to(pooled, (x.shape[0], h, w, self.filters))


class CommonEndBlock(nn.Module):
    """Head-end block: ConvNormAct transform + dropout
    (reference ``layers/model_builder.py:276``)."""

    filters: int
    dropout_rate: float = 0.1
    norm: Optional[str] = "sync_batch_norm"
    act: str = "relu"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNormAct(
            filters=self.filters, kernel_size=3, norm=self.norm, act=self.act,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x, train=train)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class DenseExt(nn.Module):
    """Dense with explicit init control (reference ``layers/dense_ext.py:13``)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class GlobalResponseNorm(nn.Module):
    """GRN of ConvNeXt-V2 (reference ``backbones/convnext_v2.py:17``)."""

    epsilon: float = 1e-6
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros_init(), (c,), self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros_init(), (c,), self.param_dtype)
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        gx = jnp.sqrt(jnp.sum(jnp.square(xf), axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + self.epsilon)
        out = gamma * (xf * nx) + beta + xf
        return out.astype(orig_dtype)


@jax.custom_vjp
def _scale_grads(x, scale):
    return x


def _scale_grads_fwd(x, scale):
    return x, scale


def _scale_grads_bwd(scale, g):
    return (jax.tree_util.tree_map(lambda t: t * scale, g), None)


_scale_grads.defvjp(_scale_grads_fwd, _scale_grads_bwd)


def scale_grads(x, scale: float):
    """Identity fwd, gradient scaled by ``scale`` in bwd
    (reference ``layers/grads_scaler.py:3-13``)."""
    return _scale_grads(x, scale)


def adaptive_average_pooling_2d(x: jax.Array, output_size) -> jax.Array:
    """Adaptive average pool to a fixed (h, w)
    (reference ``layers/poolings.py:13``). Uses an area-style resize which
    matches adaptive pooling when sizes divide evenly."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    oh, ow = output_size
    n, h, w, c = x.shape
    if h % oh == 0 and w % ow == 0:
        x = x.reshape(n, oh, h // oh, ow, w // ow, c)
        return x.mean(axis=(2, 4))
    return resize_image(x, (oh, ow), method="bilinear")
