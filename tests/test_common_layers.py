import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.nn.common_layers import (
    global_average_pooling_2d,
    global_max_pooling_2d,
    pixel_shuffle,
    pixel_unshuffle,
)
from iseg_tpu.nn.blocks import adaptive_average_pooling_2d


def test_pixel_shuffle_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 6, 8), jnp.float32)
    up = pixel_shuffle(x, 2)
    assert up.shape == (2, 8, 12, 2)
    back = pixel_unshuffle(up, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_pixel_shuffle_validates():
    with pytest.raises(ValueError):
        pixel_shuffle(jnp.zeros((1, 2, 2, 3)), 2)
    with pytest.raises(ValueError):
        pixel_unshuffle(jnp.zeros((1, 3, 4, 1)), 2)


def test_global_pools():
    x = jnp.arange(8.0).reshape(1, 2, 2, 2)
    np.testing.assert_allclose(np.asarray(global_average_pooling_2d(x))[0],
                               [3.0, 4.0])
    np.testing.assert_allclose(np.asarray(global_max_pooling_2d(x))[0],
                               [6.0, 7.0])
    assert global_average_pooling_2d(x, keepdims=True).shape == (1, 1, 1, 2)


def test_adaptive_average_pooling():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    out = adaptive_average_pooling_2d(x, 2)
    assert out.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4)
