"""Misc layer helpers (reference ``layers/common_layers.py`` /
``layers/poolings.py``): pixel shuffle/unshuffle and pooling utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """Depth-to-space: [N, H, W, C*r^2] -> [N, H*r, W*r, C]."""
    n, h, w, c = x.shape
    r = factor
    if c % (r * r) != 0:
        raise ValueError(f"channels {c} not divisible by {r*r}")
    oc = c // (r * r)
    x = x.reshape(n, h, w, r, r, oc)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, oc)


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """Space-to-depth: [N, H*r, W*r, C] -> [N, H, W, C*r^2]."""
    n, hr, wr, c = x.shape
    r = factor
    if hr % r or wr % r:
        raise ValueError(f"spatial dims {(hr, wr)} not divisible by {r}")
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h, w, c * r * r)


def global_average_pooling_2d(x: jax.Array, keepdims: bool = False) -> jax.Array:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def global_max_pooling_2d(x: jax.Array, keepdims: bool = False) -> jax.Array:
    return jnp.max(x, axis=(1, 2), keepdims=keepdims)
