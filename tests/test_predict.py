"""Tests for the predict-to-PNG driver, callbacks, and vis manager."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_predict_with_dir(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.core.predict import predict_with_dir
    from iseg_tpu.nn.heads import SimpleDecoder

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    rng = np.random.RandomState(0)
    # two differently-sized images -> exercises bucket padding + crop-back
    for name, hw in [("a.png", (40, 52)), ("b.jpg", (30, 44))]:
        arr = rng.randint(0, 255, (*hw, 3), np.uint8)
        Image.fromarray(arr).save(in_dir / name)

    model = SegManaged(
        num_class=5,
        backbone=get_backbone("mobilenetv2", output_stride=16, width_multiplier=0.35),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    written = predict_with_dir(
        model, variables, str(in_dir), str(out_dir), batch_size=2, verbose=False
    )
    assert len(written) == 2
    a = np.asarray(Image.open(out_dir / "a.png"))
    b = np.asarray(Image.open(out_dir / "b.png"))
    assert a.shape == (40, 52)  # cropped back to original size
    assert b.shape == (30, 44)
    assert a.max() < 5


def test_callbacks_fire_in_train_loop():
    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.callbacks import LambdaCallback, TimeCallback
    from iseg_tpu.core.env import EnvConfig, common_env_setup
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import CoreTrain
    from iseg_tpu.nn.heads import SimpleDecoder

    env = common_env_setup(EnvConfig(mixed_precision=False))
    model = SegManaged(
        num_class=3,
        backbone=get_backbone("mobilenetv2", output_stride=16, width_multiplier=0.35),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.01, train_steps=4)

    events = []
    trainer = CoreTrain(
        env, model, tx, input_shape=(1, 32, 32, 3), log_every=0,
        callbacks=[
            TimeCallback(),
            LambdaCallback(
                on_epoch_begin=lambda e, s: events.append(("begin", e)),
                on_epoch_end=lambda e, s, logs: events.append(("end", e, logs["steps"])),
                on_train_end=lambda s: events.append(("train_end",)),
            ),
        ],
    )

    def ds(epoch):
        rng = np.random.RandomState(epoch)
        for _ in range(2):
            yield {
                "image": rng.rand(8, 32, 32, 3).astype(np.float32),
                "label": rng.randint(0, 3, (8, 32, 32)).astype(np.int32),
            }

    trainer.train(ds, epochs=2)
    assert ("begin", 0) in events and ("begin", 1) in events
    assert ("end", 1, 2) in events
    assert events[-1] == ("train_end",)


def test_vis_manager_records_under_jit():
    from iseg_tpu.utils.vis import get_visualization_manager

    vm = get_visualization_manager()
    vm.clear()
    vm.enabled = True

    @jax.jit
    def f(x):
        vm.record("hidden", x * 2)
        return x + 1

    f(jnp.ones((2, 2)))
    jax.effects_barrier()
    assert vm.names() == ["hidden"]
    np.testing.assert_allclose(vm.get("hidden")[0], 2.0)
    vm.enabled = False
    vm.clear()
