"""Fused on-device augmentation.

TPU-native replacement for the hot path of the reference's tf.data recipe
(``data_process/pipeline.py:85-170``): the whole
random-scale -> random-crop -> flip -> photometric -> erase chain runs as
ONE jitted, vmapped program on device, with static output shapes.

The static-shape trick: random scale + crop compose into a single
``jax.image.scale_and_translate`` call (output fixed at crop size; the
traced scale/translation carry the randomness), so no dynamic shapes ever
exist. Labels use an equivalent nearest-neighbor gather. Out-of-crop pixels
get the mean pixel / ignore label, matching the host pipeline's padding
semantics.

Use: keep the flexible host pipeline for generality; switch to
``make_device_augment`` when input is the bottleneck.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DeviceAugmentConfig:
    crop_size: tuple[int, int] = (512, 512)
    min_scale_factor: float = 0.5
    max_scale_factor: float = 2.0
    scale_step_size: float = 0.25
    flip_prob: float = 0.5
    random_brightness: bool = False
    brightness_max_delta: float = 32.0
    random_erasing: bool = False
    erase_prob: float = 0.5
    erase_scale: tuple[float, float] = (0.02, 0.2)
    ignore_label: int = 255
    mean_pixel: tuple[float, float, float] = (127.5, 127.5, 127.5)


def _sample_scale(key, cfg: DeviceAugmentConfig):
    if cfg.min_scale_factor == cfg.max_scale_factor:
        return jnp.float32(cfg.min_scale_factor)
    if cfg.scale_step_size == 0:
        return jax.random.uniform(
            key, (), minval=cfg.min_scale_factor, maxval=cfg.max_scale_factor
        )
    n = int((cfg.max_scale_factor - cfg.min_scale_factor) / cfg.scale_step_size) + 1
    steps = jnp.linspace(cfg.min_scale_factor, cfg.max_scale_factor, n)
    return steps[jax.random.randint(key, (), 0, n)]


def _augment_one(key, image, label, cfg: DeviceAugmentConfig):
    h, w, c = image.shape
    ch, cw = cfg.crop_size
    k_scale, k_crop, k_flip, k_bri, k_er1, k_er2, k_er3 = jax.random.split(key, 7)

    scale = _sample_scale(k_scale, cfg)
    sh, sw = h * scale, w * scale  # scaled source extent (traced floats)

    # crop offset within the scaled image; if scaled < crop, offset 0 and
    # the out-of-source region becomes padding
    max_y = jnp.maximum(sh - ch, 0.0)
    max_x = jnp.maximum(sw - cw, 0.0)
    off = jax.random.uniform(k_crop, (2,))
    ty = -off[0] * max_y
    tx = -off[1] * max_x

    img = jax.image.scale_and_translate(
        image.astype(jnp.float32), (ch, cw, c), (0, 1, 2),
        jnp.array([scale, scale, 1.0]), jnp.array([ty, tx, 0.0]),
        method="linear", antialias=False,
    )

    # nearest-gather the label with identical geometry. scale_and_translate
    # samples output index i at input (i + 0.5 - t)/scale - 0.5 (pixel
    # CENTERS; jax._src.image.scale compute_weight_mat) — the gather must
    # use the same formula or labels shift up to half a source pixel
    # against the image at scale != 1
    dy = (jnp.arange(ch, dtype=jnp.float32) + 0.5 - ty) / scale - 0.5
    dx = (jnp.arange(cw, dtype=jnp.float32) + 0.5 - tx) / scale - 0.5
    yi = jnp.round(dy).astype(jnp.int32)
    xi = jnp.round(dx).astype(jnp.int32)
    in_y = (yi >= 0) & (yi < h)
    in_x = (xi >= 0) & (xi < w)
    valid = in_y[:, None] & in_x[None, :]
    lab = label[jnp.clip(yi, 0, h - 1)][:, jnp.clip(xi, 0, w - 1)]
    lab = jnp.where(valid, lab, cfg.ignore_label)

    # brightness BEFORE the mean-pixel fill (host-pipeline order:
    # photometric runs before PadAugment, so padded pixels stay exactly
    # mean_pixel rather than mean + delta)
    if cfg.random_brightness:
        delta = jax.random.uniform(
            k_bri, (), minval=-cfg.brightness_max_delta,
            maxval=cfg.brightness_max_delta,
        )
        img = jnp.clip(img + delta, 0.0, 255.0)

    mean_pix = jnp.asarray(cfg.mean_pixel, jnp.float32)
    img = jnp.where(valid[:, :, None], img, mean_pix)

    # horizontal flip
    do_flip = jax.random.bernoulli(k_flip, cfg.flip_prob)
    img = jnp.where(do_flip, img[:, ::-1], img)
    lab = jnp.where(do_flip, lab[:, ::-1], lab)

    if cfg.random_erasing:
        do_erase = jax.random.bernoulli(k_er1, cfg.erase_prob)
        area = ch * cw * jax.random.uniform(
            k_er2, (), minval=cfg.erase_scale[0], maxval=cfg.erase_scale[1]
        )
        side = jnp.sqrt(area)
        ey = jax.random.randint(k_er3, (), 0, max(ch - 1, 1))
        ex = jax.random.randint(jax.random.fold_in(k_er3, 1), (), 0, max(cw - 1, 1))
        ys = jnp.arange(ch)[:, None]
        xs = jnp.arange(cw)[None, :]
        rect = (ys >= ey) & (ys < ey + side) & (xs >= ex) & (xs < ex + side)
        rect = rect & do_erase
        noise = jax.random.uniform(
            jax.random.fold_in(k_er3, 2), (ch, cw, c), minval=0.0, maxval=255.0
        )
        img = jnp.where(rect[:, :, None], noise, img)
        lab = jnp.where(rect, cfg.ignore_label, lab)

    return img, lab.astype(jnp.int32)


def make_device_augment(cfg: Optional[DeviceAugmentConfig] = None):
    """Returns jitted ``augment(rng, images [N,H,W,3] raw 0-255,
    labels [N,H,W]) -> (images [N,ch,cw,3], labels [N,ch,cw])``.

    Input normalization composes after (``iseg_tpu.data.input_norm`` modes
    are elementwise and fuse into the same program under an outer jit)."""
    cfg = cfg or DeviceAugmentConfig()

    @jax.jit
    def augment(rng, images, labels):
        keys = jax.random.split(rng, images.shape[0])
        return jax.vmap(partial(_augment_one, cfg=cfg))(keys, images, labels)

    return augment
