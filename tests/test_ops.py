import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.ops.numerics import (
    safed_softmax,
    replace_nan,
    replace_non_finite,
    guard_grads,
    l2_normalize,
)
from iseg_tpu.ops.resize import (
    resize_image,
    scaled_size,
    resize_to_range,
    resample_abs_pos_embed,
    dynamic_pad_2d,
)


def test_resize_image_bilinear_shape_and_dtype():
    x = jnp.ones((2, 8, 8, 3), jnp.bfloat16)
    y = resize_image(x, (16, 16))
    assert y.shape == (2, 16, 16, 3)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32), 1.0)


def test_resize_image_nearest_for_int_labels():
    lab = jnp.array([[[0, 1], [2, 3]]], jnp.int32)[..., None]
    y = resize_image(lab, (4, 4))
    assert y.dtype == jnp.int32
    assert set(np.unique(np.asarray(y))) == {0, 1, 2, 3}


def test_resize_hwc():
    x = jnp.zeros((8, 8, 3))
    assert resize_image(x, (4, 4)).shape == (4, 4, 3)


def test_scaled_size_rounding():
    assert scaled_size(512, 512, 0.5) == (256, 256)
    assert scaled_size(513, 511, 0.75) == (385, 383)
    assert scaled_size(2, 2, 0.1) == (1, 1)


def test_resize_to_range():
    # reference semantics: min_size rescales the SHORT side to it exactly
    # (down as well as up, data_process/utils.py:385-388)
    assert resize_to_range(100, 200, min_size=50, max_size=None) == (50, 100)
    h, w = resize_to_range(100, 200, min_size=200, max_size=None)
    assert min(h, w) == 200
    h, w = resize_to_range(100, 400, min_size=None, max_size=200)
    assert max(h, w) <= 200
    # max_size caps the long side when the min_size scale would exceed it
    h, w = resize_to_range(600, 800, min_size=512, max_size=640)
    assert max(h, w) == 640


def test_safed_softmax_masked_rows_are_zero():
    logits = jnp.ones((2, 4))
    mask = jnp.array([[1, 1, 0, 0], [0, 0, 0, 0]], bool)
    out = safed_softmax(logits, mask)
    np.testing.assert_allclose(np.asarray(out[0]), [0.5, 0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)


def test_safed_softmax_unmasked_matches_jax():
    logits = jnp.array([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(
        np.asarray(safed_softmax(logits)),
        np.asarray(jax.nn.softmax(logits)),
        atol=1e-6,
    )


def test_replace_nan_and_non_finite():
    x = jnp.array([1.0, jnp.nan, jnp.inf, -jnp.inf])
    y = replace_nan(x)
    assert not np.isnan(np.asarray(y)).any()
    z = replace_non_finite(x)
    assert np.isfinite(np.asarray(z)).all()


def test_guard_grads_scrubs_nan_gradient():
    def f(x):
        y = guard_grads(x)
        return jnp.sum(jnp.where(x > 0, y, jnp.sqrt(y)))  # sqrt(neg) -> nan grad

    g = jax.grad(f)(jnp.array([-1.0, 4.0]))
    assert np.isfinite(np.asarray(g)).all()


def test_l2_normalize():
    x = jnp.array([[3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(l2_normalize(x)), [[0.6, 0.8]], atol=1e-6)


def test_resample_pos_embed():
    pe = jnp.arange(1 * (1 + 16) * 8, dtype=jnp.float32).reshape(1, 17, 8)
    out = resample_abs_pos_embed(pe, (8, 8), num_prefix_tokens=1)
    assert out.shape == (1, 1 + 64, 8)
    # prefix token unchanged
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(pe[:, 0]))
    # same-size is identity
    same = resample_abs_pos_embed(pe, (4, 4), num_prefix_tokens=1)
    np.testing.assert_allclose(np.asarray(same), np.asarray(pe))


def test_dynamic_pad_2d():
    x = jnp.ones((1, 3, 5, 2))
    y = dynamic_pad_2d(x, (8, 8), value=0.5)
    assert y.shape == (1, 8, 8, 2)
    assert float(y[0, 7, 7, 0]) == 0.5
    yc = dynamic_pad_2d(x, (7, 7), value=0.0, center=True)
    assert float(yc[0, 0, 0, 0]) == 0.0
    assert float(yc[0, 3, 3, 0]) == 1.0
