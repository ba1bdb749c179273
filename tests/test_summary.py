"""Durable scalar logging: event-file wire format, CSV, CoreTrain/evaluate
wiring (VERDICT r2 #7; reference TensorBoard callback core_train.py:121-126)."""

import csv
import glob
import os

import numpy as np
import pytest

from iseg_tpu.utils.summary import (
    ScalarLogger,
    SummaryWriter,
    crc32c,
    read_event_scalars,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_writer_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, 1)
    w.add_scalar("train/loss", 0.25, 2)
    w.add_scalars({"a": 1.0, "b": -2.5}, 3)
    w.close()
    rows = read_event_scalars(w.path)
    assert (1, "train/loss", 0.5) in rows
    assert (2, "train/loss", 0.25) in rows
    assert (3, "a", 1.0) in rows
    assert (3, "b", -2.5) in rows


def test_event_file_readable_by_tensorflow(tmp_path):
    """Cross-check the wire format against TF's own event reader — the
    strongest proof TensorBoard can consume these files."""
    tf = pytest.importorskip("tensorflow")
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 0.125, 7)
    w.add_scalar("miou", 0.875, 8)
    w.close()

    got = []
    version = None
    for raw in tf.data.TFRecordDataset(w.path):
        event = tf.compat.v1.Event.FromString(raw.numpy())
        if event.file_version:
            version = event.file_version
        for v in event.summary.value:
            got.append((event.step, v.tag, round(float(v.simple_value), 6)))
    assert version == "brain.Event:2"
    assert (7, "loss", 0.125) in got
    assert (8, "miou", 0.875) in got


def test_scalar_logger_csv(tmp_path):
    logger = ScalarLogger(str(tmp_path))
    logger.log({"x": 1.5}, 10)
    logger.log({"x": 2.5, "y": 0.0}, 20)
    logger.close()
    with open(os.path.join(str(tmp_path), "scalars.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["step", "tag", "value", "wall_time"]
    assert rows[1][:3] == ["10", "x", "1.5"]
    assert len(rows) == 4


def test_core_train_writes_scalars(tmp_path):
    """CoreTrain(log_dir=...) produces a TensorBoard-readable event file
    with per-step losses, LR, step time, and epoch summaries."""
    import jax
    import jax.numpy as jnp

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.env import EnvConfig, common_env_setup
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import CoreTrain
    from iseg_tpu.nn.heads import SimpleDecoder

    env = common_env_setup(EnvConfig())
    model = SegManaged(
        num_class=3,
        backbone=get_backbone("resnet9", output_stride=16),
        head=SimpleDecoder(filters=8, low_level_filters=4),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tx, schedule = get_optimizer(
        variables["params"], "sgd", learning_rate=0.1, train_steps=10
    )
    log_dir = str(tmp_path / "logs")
    trainer = CoreTrain(
        env, model, tx, input_shape=(1, 32, 32, 3), log_every=1,
        log_dir=log_dir, lr_schedule=schedule,
    )

    def dataset_fn(epoch):
        rng = np.random.RandomState(epoch)
        for _ in range(2):
            yield {
                "image": rng.rand(8, 32, 32, 3).astype(np.float32),
                "label": rng.randint(0, 3, (8, 32, 32)).astype(np.int32),
            }

    trainer.train(dataset_fn, epochs=2, steps_per_epoch=2)

    events = glob.glob(os.path.join(log_dir, "events.out.tfevents.*"))
    assert len(events) == 1
    rows = read_event_scalars(events[0])
    tags = {t for _, t, _ in rows}
    assert "train/loss" in tags
    assert "train/learning_rate" in tags
    assert "train/step_seconds" in tags
    assert "epoch/seconds" in tags
    # 4 logged steps (log_every=1, 2 epochs x 2 steps)
    assert len([r for r in rows if r[1] == "train/loss"]) == 4
    steps = sorted(r[0] for r in rows if r[1] == "train/loss")
    assert steps == [1, 2, 3, 4]
    # CSV mirror exists and has the same loss rows
    with open(os.path.join(log_dir, "scalars.csv")) as f:
        csv_rows = list(csv.reader(f))
    assert len([r for r in csv_rows if r[1:2] == ["train/loss"]]) == 4


def test_evaluate_writes_scalars(tmp_path):
    import jax
    import jax.numpy as jnp

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.env import EnvConfig, common_env_setup
    from iseg_tpu.core.evaluation import evaluate
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.nn.heads import SimpleDecoder

    env = common_env_setup(EnvConfig())
    model = SegManaged(
        num_class=3,
        backbone=get_backbone("resnet9", output_stride=16),
        head=SimpleDecoder(filters=8, low_level_filters=4),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    rng = np.random.RandomState(0)
    ds = [{
        "image": rng.rand(8, 32, 32, 3).astype(np.float32),
        "label": rng.randint(0, 3, (8, 32, 32)).astype(np.int32),
    }]
    log_dir = str(tmp_path / "eval_logs")
    miou, per_class = evaluate(
        env, model, variables, ds, verbose=False,
        log_dir=log_dir, log_step=42,
    )
    events = glob.glob(os.path.join(log_dir, "events.out.tfevents.*"))
    rows = read_event_scalars(events[0])
    lookup = {(s, t): v for s, t, v in rows}
    assert abs(lookup[(42, "eval/mean_iou")] - float(miou)) < 1e-6
    for i in range(3):
        assert (42, f"eval/iou_class_{i}") in lookup
