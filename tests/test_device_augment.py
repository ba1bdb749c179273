"""Tests for the fused on-device augmentation path."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.data.device_augment import DeviceAugmentConfig, make_device_augment


def _batch(n=2, h=40, w=48):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(n, h, w, 3) * 255, jnp.float32)
    labels = jnp.asarray(rng.randint(0, 21, (n, h, w)), jnp.int32)
    return images, labels


def test_shapes_and_determinism():
    aug = make_device_augment(DeviceAugmentConfig(crop_size=(32, 32)))
    images, labels = _batch()
    k = jax.random.PRNGKey(0)
    i1, l1 = aug(k, images, labels)
    i2, l2 = aug(k, images, labels)
    assert i1.shape == (2, 32, 32, 3)
    assert l1.shape == (2, 32, 32)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2))
    i3, _ = aug(jax.random.PRNGKey(1), images, labels)
    assert not np.allclose(np.asarray(i1), np.asarray(i3))


def test_identity_config_preserves_content():
    # scale fixed at 1, no flip/photo/erase, crop == input -> identity
    cfg = DeviceAugmentConfig(
        crop_size=(40, 48), min_scale_factor=1.0, max_scale_factor=1.0,
        flip_prob=0.0,
    )
    aug = make_device_augment(cfg)
    images, labels = _batch()
    out_i, out_l = aug(jax.random.PRNGKey(0), images, labels)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(images), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(labels))


def test_small_scale_pads_with_mean_and_ignore():
    cfg = DeviceAugmentConfig(
        crop_size=(64, 64), min_scale_factor=0.5, max_scale_factor=0.5,
        flip_prob=0.0, mean_pixel=(1.0, 2.0, 3.0),
    )
    aug = make_device_augment(cfg)
    images, labels = _batch(h=40, w=48)  # scaled: 20x24 inside 64x64 crop
    out_i, out_l = aug(jax.random.PRNGKey(0), images, labels)
    # bottom-right is padding
    np.testing.assert_allclose(np.asarray(out_i[0, -1, -1]), [1.0, 2.0, 3.0])
    assert int(out_l[0, -1, -1]) == 255
    # some real content survives
    assert (np.asarray(out_l[0]) != 255).sum() > 100


def test_label_geometry_matches_image_resample_at_nonunit_scale():
    # the nearest label gather must use scale_and_translate's half-pixel-
    # center convention ((i + 0.5 - t)/scale - 0.5). A row-index ramp
    # "image" resampled linearly gives the exact sampling coordinate, so
    # the gathered label (its nearest rounding) must stay within half a
    # source pixel of it with ~zero mean offset; the pre-fix formula was
    # off by 0.5*(1-scale)/scale, which this catches at every scale.
    h, w = 32, 40
    row_ramp = np.broadcast_to(
        np.arange(h, dtype=np.float32)[:, None], (h, w)).copy()
    # scales chosen so sample points never land exactly halfway between
    # source pixels (0.5 with ty=0 puts EVERY sample on a .5 tie, where
    # nearest is tie-break-defined and the error is legitimately 0.5)
    for scale in (0.6, 0.8, 1.3, 1.9):
        cfg = DeviceAugmentConfig(
            crop_size=(24, 24), min_scale_factor=scale,
            max_scale_factor=scale, flip_prob=0.0,
        )
        aug = make_device_augment(cfg)
        img = jnp.asarray(np.repeat(row_ramp[None, :, :, None], 3, -1))
        lab = jnp.asarray(row_ramp[None].astype(np.int32))
        out_i, out_l = aug(jax.random.PRNGKey(3), img, lab)
        labels = np.asarray(out_l[0], np.float64)
        coords = np.asarray(out_i[0, :, :, 0], np.float64)
        interior = (labels != 255) & (coords > 0.6) & (coords < h - 1.6)
        assert interior.sum() > 100
        err = labels[interior] - coords[interior]
        assert np.abs(err).max() <= 0.5 + 1e-3, f"scale={scale}"
        assert abs(err.mean()) < 0.12, f"scale={scale} mean={err.mean()}"


def test_brightness_keeps_padding_at_mean_pixel():
    # host order is photometric BEFORE padding, so padded pixels must be
    # exactly mean_pixel even with brightness on
    cfg = DeviceAugmentConfig(
        crop_size=(64, 64), min_scale_factor=0.5, max_scale_factor=0.5,
        flip_prob=0.0, mean_pixel=(9.0, 9.0, 9.0),
        random_brightness=True, brightness_max_delta=32.0,
    )
    aug = make_device_augment(cfg)
    images, labels = _batch(h=40, w=48)
    out_i, out_l = aug(jax.random.PRNGKey(0), images, labels)
    pad_mask = np.asarray(out_l[0]) == 255
    assert pad_mask.sum() > 100
    np.testing.assert_allclose(
        np.asarray(out_i[0])[pad_mask], 9.0, atol=1e-4)


def test_flip_always():
    cfg = DeviceAugmentConfig(
        crop_size=(40, 48), min_scale_factor=1.0, max_scale_factor=1.0,
        flip_prob=1.0,
    )
    aug = make_device_augment(cfg)
    images, labels = _batch()
    out_i, out_l = aug(jax.random.PRNGKey(0), images, labels)
    np.testing.assert_allclose(
        np.asarray(out_i), np.asarray(images[:, :, ::-1]), atol=1e-3)


def test_erasing_writes_ignore():
    cfg = DeviceAugmentConfig(
        crop_size=(40, 48), min_scale_factor=1.0, max_scale_factor=1.0,
        flip_prob=0.0, random_erasing=True, erase_prob=1.0,
        erase_scale=(0.1, 0.15),
    )
    aug = make_device_augment(cfg)
    images, labels = _batch()
    _, out_l = aug(jax.random.PRNGKey(3), images, labels)
    assert (np.asarray(out_l) == 255).sum() > 0
