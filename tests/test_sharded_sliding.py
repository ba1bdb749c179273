"""Device-parallel sliding-window inference: sharded window sweep over the
8-device mesh must equal the serial sweep exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.core.env import EnvConfig, common_env_setup
from iseg_tpu.core.inference import (
    inference_with_sliding_window,
    inference_with_sliding_window_sharded,
)


def test_sharded_windows_match_serial():
    env = common_env_setup(EnvConfig(mixed_precision=False))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 20, 24, 3), jnp.float32)

    # a nontrivial "model": channel-mixing + nonlinearity at window level
    w = jnp.asarray(np.random.RandomState(1).rand(3, 5), jnp.float32)
    apply_fn = lambda win: jnp.tanh(win @ w)

    serial = inference_with_sliding_window(apply_fn, x, (8, 8), stride_rate=0.5)
    sharded = inference_with_sliding_window_sharded(
        apply_fn, x, (8, 8), env.mesh, stride_rate=0.5
    )
    assert sharded.shape == serial.shape
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(serial),
                               rtol=1e-5, atol=1e-6)


def test_sharded_windows_with_window_batch():
    # window_batch on the sharded sweep: each device runs wb windows per
    # forward; sentinel padding grows to an n_dev*wb multiple. Must still
    # equal the serial sweep exactly.
    env = common_env_setup(EnvConfig(mixed_precision=False))
    x = jnp.asarray(np.random.RandomState(4).rand(1, 20, 24, 3), jnp.float32)
    w = jnp.asarray(np.random.RandomState(5).rand(3, 4), jnp.float32)
    apply_fn = lambda win: jnp.tanh(win @ w) + (win @ w) ** 2

    serial = inference_with_sliding_window(apply_fn, x, (8, 8), stride_rate=0.5)
    for wb in (2, 3):
        sharded = inference_with_sliding_window_sharded(
            apply_fn, x, (8, 8), env.mesh, stride_rate=0.5, window_batch=wb
        )
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(serial),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_single_window():
    env = common_env_setup(EnvConfig(mixed_precision=False))
    x = jnp.ones((1, 6, 6, 2))
    out = inference_with_sliding_window_sharded(
        lambda w: w * 3, x, (8, 8), env.mesh
    )
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-6)


def test_sharded_windows_with_real_model():
    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.nn.heads import SimpleDecoder

    env = common_env_setup(EnvConfig(mixed_precision=False))
    model = SegManaged(
        num_class=3,
        backbone=get_backbone("mobilenetv2", output_stride=16, width_multiplier=0.35),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 48, 64, 3), jnp.float32)

    apply_fn = lambda win: model.apply(variables, win, train=False)
    serial = inference_with_sliding_window(apply_fn, x, (32, 32), stride_rate=0.5)
    sharded = inference_with_sliding_window_sharded(
        apply_fn, x, (32, 32), env.mesh, stride_rate=0.5)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(serial),
                               rtol=1e-4, atol=1e-5)
