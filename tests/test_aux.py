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


def test_step_timer_p90_is_not_the_max():
    from iseg_tpu.utils.profiling import StepTimer

    t = StepTimer()
    t._times = [0.01] * 9 + [9.0]  # one recompile straggler
    s = t.summary()
    assert s["p90_s"] == 0.01  # nearest-rank p90 = s[ceil(0.9*10)-1] = s[8]


def test_vis_manager_enabled_toggles_after_compile():
    import jax
    import jax.numpy as jnp
    from iseg_tpu.utils.vis import VisualizationManager

    mgr = VisualizationManager()  # disabled at trace time

    @jax.jit
    def f(x):
        return mgr.record("probe", x) * 2

    f(jnp.ones((2,)))  # compiles with enabled=False
    assert mgr.get("probe") == []
    mgr.enabled = True  # toggle AFTER compile: must take effect
    f(jnp.ones((2,)))
    assert len(mgr.get("probe")) == 1
    mgr.enabled = False
    f(jnp.ones((2,)))
    assert len(mgr.get("probe")) == 1  # and back off again


def test_varint_negative_step_does_not_hang():
    from iseg_tpu.utils.summary import _varint

    enc = _varint(-1)
    assert len(enc) == 10  # two's-complement int64


def test_bucket_never_smaller_than_image():
    from iseg_tpu.utils.buckets import bucket_hw

    bh, bw = bucket_hw(1000, 1500, 128, max_hw=(512, 512))
    assert bh >= 1000 and bw >= 1500  # cap bounds the GRID, not the image
    assert bucket_hw(100, 200, 128, max_hw=(512, 512)) == (128, 256)


def test_summary_writer_names_unique_same_second(tmp_path):
    from iseg_tpu.utils.summary import SummaryWriter

    a = SummaryWriter(str(tmp_path))
    b = SummaryWriter(str(tmp_path))
    assert a.path != b.path


def test_fsdp_base_specs_keep_model_axis():
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    import jax
    from iseg_tpu.parallel.fsdp import fsdp_shardings

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    tree = {"w": np.zeros((256, 128), np.float32)}
    base = {"w": P(None, "model")}
    sh = fsdp_shardings(tree, mesh, base_specs=base, min_size=1)
    # model axis preserved, FSDP takes the free dim
    assert sh["w"].spec == P("data", "model")


def test_static_strings_tables():
    from iseg_tpu import static_strings as ss

    assert ss.DATASET_NUM_CLASSES[ss.PASCAL_VOC2012] == 21
    assert ss.DATASET_NUM_CLASSES[ss.CITYSCAPES] == 19
    assert ss.DATASET_IGNORE_LABEL[ss.ADE20K] == 0
