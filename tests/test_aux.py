"""Tests for aux subsystems: hooks, shared init, profiling timer,
static strings, device-augment config."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_hook_point_captures():
    import flax.linen as nn

    from iseg_tpu.nn.hooks import HookPoint, get_taps

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(4)(x)
            x = HookPoint(name="mid")(x)
            return nn.Dense(2)(x)

    m = M()
    variables = m.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))
    out, mut = m.apply(variables, jnp.ones((1, 3)), mutable=["intermediates"])
    taps = get_taps(mut)
    assert any("mid" in k for k in taps)
    tap = [v for k, v in taps.items() if "mid" in k][0]
    assert tap.shape == (1, 4)


def test_shared_initializer_ties_weights():
    from iseg_tpu.nn.initializers import SharedInitializer

    value = np.arange(6, dtype=np.float32).reshape(2, 3)
    init = SharedInitializer(value)
    a = init(None, (2, 3))
    b = SharedInitializer(value, transpose=True)(None, (3, 2))
    np.testing.assert_allclose(np.asarray(a), value)
    np.testing.assert_allclose(np.asarray(b), value.T)
    with pytest.raises(ValueError):
        init(None, (3, 3))


def test_step_timer():
    from iseg_tpu.utils.profiling import StepTimer

    t = StepTimer()
    assert t.tick() is None
    time.sleep(0.01)
    dt = t.tick()
    assert dt is not None and dt >= 0.009
    s = t.summary()
    assert s["steps"] == 1 and s["p50_s"] >= 0.009


def test_static_strings_tables():
    from iseg_tpu import static_strings as ss

    assert ss.DATASET_NUM_CLASSES[ss.PASCAL_VOC2012] == 21
    assert ss.DATASET_NUM_CLASSES[ss.CITYSCAPES] == 19
    assert ss.DATASET_IGNORE_LABEL[ss.ADE20K] == 0
