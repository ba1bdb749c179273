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
