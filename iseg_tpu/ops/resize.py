"""Image resizing and positional-embedding resampling.

Parity with the reference's ``utils/common.py`` (``resize_image`` :107,
scaled sizes :137-188, pos-embed resample :206-263). All functions are pure,
jittable, static-shape (target sizes are Python ints at trace time), NHWC.

TPU-first notes: ``jax.image.resize`` lowers bilinear/bicubic resizes to
gather+matmul forms XLA tiles well; `antialias=False` matches TF2's
``tf.image.resize`` default used throughout the reference.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _normalize_size(size) -> tuple[int, int]:
    if isinstance(size, int):
        return (size, size)
    h, w = size
    return (int(h), int(w))


def _align_corners_matrix(out_len: int, in_len: int, dtype) -> jax.Array:
    """[out, in] linear-interpolation matrix with TF-v1 align_corners
    semantics (src = i * (in-1)/(out-1)). Host-precomputed; the resize
    becomes two small matmuls, which XLA tiles onto the MXU."""
    import numpy as np

    if out_len == 1 or in_len == 1:
        w = np.zeros((out_len, in_len), np.float32)
        w[:, 0] = 1.0
        return jnp.asarray(w, dtype)
    src = np.arange(out_len) * (in_len - 1) / (out_len - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    frac = (src - lo).astype(np.float32)
    w = np.zeros((out_len, in_len), np.float32)
    w[np.arange(out_len), lo] += 1.0 - frac
    w[np.arange(out_len), hi] += frac
    return jnp.asarray(w, dtype)


def resize_bilinear_align_corners(x: jax.Array, size: Sequence[int] | int) -> jax.Array:
    """Bilinear NHWC resize with ``tf.compat.v1.image.resize(...,
    align_corners=True)`` semantics (the reference HRNet fuse/head path,
    ``backbones/hrnet.py:303,530``). Separable: one matmul per axis."""
    h, w = _normalize_size(size)
    if x.shape[1] == h and x.shape[2] == w:
        return x
    ct = jnp.float32 if x.dtype == jnp.float64 else x.dtype
    wh = _align_corners_matrix(h, x.shape[1], ct)
    ww = _align_corners_matrix(w, x.shape[2], ct)
    y = jnp.einsum("oh,nhwc->nowc", wh, x.astype(ct))
    y = jnp.einsum("pw,nowc->nopc", ww, y)
    return y.astype(x.dtype)


def resize_image(
    x: jax.Array,
    size: Sequence[int] | int,
    method: str = "bilinear",
    antialias: bool = False,
    align_corners: bool = False,
) -> jax.Array:
    """Resize NHWC (or HWC) images to ``size=(H, W)``.

    Reference ``utils/common.py:107`` — bilinear for float tensors, nearest
    for integer label maps. Half-pixel-center sampling matches
    ``tf.image.resize`` semantics.
    """
    h, w = _normalize_size(size)
    squeeze = False
    if x.ndim == 3:
        x = x[None]
        squeeze = True
    if x.ndim != 4:
        raise ValueError(f"resize_image expects NHWC or HWC, got shape {x.shape}")

    n, _, _, c = x.shape
    if jnp.issubdtype(x.dtype, jnp.integer) or method == "nearest":
        out = jax.image.resize(x, (n, h, w, c), method="nearest")
    elif align_corners and method == "bilinear":
        out = resize_bilinear_align_corners(x, (h, w))
    else:
        out = jax.image.resize(x, (n, h, w, c), method=method, antialias=antialias)
        out = out.astype(x.dtype)
    if squeeze:
        out = out[0]
    return out


def scaled_size(height: int, width: int, scale: float) -> tuple[int, int]:
    """Scale a (H, W) pair like the reference's scaled-size helper
    (``utils/common.py:137-188``): round-half-up per dimension, min 1."""
    return (max(1, int(height * scale + 0.5)), max(1, int(width * scale + 0.5)))


def resize_to_range(
    height: int,
    width: int,
    min_size: int | None = None,
    max_size: int | None = None,
) -> tuple[int, int]:
    """Compute a target size following the reference's ``resize_to_range``
    (``data_process/utils.py:374``): when ``min_size`` is given, rescale so
    the SHORT side equals it exactly — down as well as up (DeepLab eval
    resizes every image to short-side = min_size) — unless the long side
    would exceed ``max_size``, in which case the long side equals
    ``max_size``. Sizes round with ceil like the reference.

    Pure Python math (sizes are static under jit)."""
    import math

    if min_size is None:
        scale = 1.0
        if max_size is not None and max(height, width) > max_size:
            scale = max_size / max(height, width)
        return (max(1, int(height * scale + 0.5)),
                max(1, int(width * scale + 0.5)))
    scale = min_size / min(height, width)
    if max_size is not None and max(height, width) * scale > max_size:
        scale = max_size / max(height, width)
    return (max(1, math.ceil(height * scale)), max(1, math.ceil(width * scale)))


def resample_abs_pos_embed(
    pos_embed: jax.Array,
    new_hw: tuple[int, int],
    old_hw: tuple[int, int] | None = None,
    num_prefix_tokens: int = 1,
    method: str = "bicubic",
) -> jax.Array:
    """Resample a [1, N(+prefix), C] absolute positional embedding to a new
    grid size so ViT-family backbones stay input-size free.

    Reference ``utils/common.py:206-263`` (bicubic resample, prefix tokens
    such as the class token pass through unchanged).
    """
    if pos_embed.ndim != 3:
        raise ValueError(f"pos_embed must be [1, N, C], got {pos_embed.shape}")
    prefix = pos_embed[:, :num_prefix_tokens] if num_prefix_tokens else None
    grid = pos_embed[:, num_prefix_tokens:]
    n = grid.shape[1]
    if old_hw is None:
        side = int(round(n ** 0.5))
        if side * side != n:
            raise ValueError(f"cannot infer square grid from {n} tokens")
        old_hw = (side, side)
    oh, ow = old_hw
    nh, nw = new_hw
    if (oh, ow) == (nh, nw):
        return pos_embed
    c = grid.shape[-1]
    grid = grid.reshape(1, oh, ow, c)
    orig_dtype = grid.dtype
    # antialias=False matches tf.image.resize's default (the reference's
    # resize_pos_embed, ``backbones/vit.py:19-64``) when downsampling
    grid = jax.image.resize(grid.astype(jnp.float32), (1, nh, nw, c),
                            method=method, antialias=False)
    grid = grid.reshape(1, nh * nw, c).astype(orig_dtype)
    if prefix is not None:
        grid = jnp.concatenate([prefix, grid], axis=1)
    return grid


def dynamic_pad_2d(
    x: jax.Array,
    target_hw: tuple[int, int],
    value: float | jax.Array = 0.0,
    center: bool = False,
) -> jax.Array:
    """Pad NHWC/HWC spatial dims up to ``target_hw``
    (reference ``utils/tensor_utils.py:5`` ``dynamic_padding_2d``)."""
    spatial_offset = 1 if x.ndim == 4 else 0
    h, w = x.shape[spatial_offset], x.shape[spatial_offset + 1]
    th, tw = target_hw
    ph, pw = max(0, th - h), max(0, tw - w)
    if center:
        top, left = ph // 2, pw // 2
    else:
        top, left = 0, 0
    pad = [(0, 0)] * x.ndim
    pad[spatial_offset] = (top, ph - top)
    pad[spatial_offset + 1] = (left, pw - left)
    return jnp.pad(x, pad, constant_values=value)
