"""Pre-decoded shard dataset: write/read roundtrip, sharding semantics,
and end-to-end training from disk through device_augment."""

import json
import os

import numpy as np
import pytest

from iseg_tpu.data.shards import (
    ShardReader,
    make_shard_dataset_fn,
    shard_batches,
    write_shards,
)


class _SyntheticDataset:
    """Deterministic variable-size (image, label) pairs."""

    def __init__(self, n=10, hw=(40, 56), num_class=4, vary=True):
        self.n = n
        self.hw = hw
        self.num_class = num_class
        self.vary = vary

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        h, w = self.hw
        if self.vary:
            h, w = h + (i % 3) * 8, w - (i % 2) * 16
        image = rng.randint(0, 256, (h, w, 3)).astype(np.float32)
        label = rng.randint(0, self.num_class, (h, w)).astype(np.int32)
        return image, label


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("shards"))
    write_shards(
        _SyntheticDataset(n=10),
        d,
        store_size=(48, 64),
        samples_per_shard=4,
        ignore_label=255,
    )
    return d


def test_write_creates_index_and_files(shard_dir):
    index = json.load(open(os.path.join(shard_dir, "index.json")))
    assert index["num_samples"] == 10
    assert [s["count"] for s in index["shards"]] == [4, 4, 2]
    for sid in range(3):
        assert os.path.exists(os.path.join(shard_dir, f"images-{sid:05d}.npy"))
        assert os.path.exists(os.path.join(shard_dir, f"labels-{sid:05d}.npy"))


def test_roundtrip_same_size_sample(tmp_path):
    """A sample already at store size is preserved exactly (no resize)."""
    ds = _SyntheticDataset(n=3, hw=(48, 64), vary=False)
    d = str(tmp_path / "s")
    write_shards(ds, d, store_size=(48, 64), samples_per_shard=2)
    reader = ShardReader(d)
    images, labels = reader.gather([0, 1, 2])
    for i in range(3):
        ref_img, ref_lab = ds[i]
        np.testing.assert_array_equal(images[i], ref_img.astype(np.uint8))
        np.testing.assert_array_equal(labels[i], ref_lab.astype(np.uint8))


def test_small_samples_store_at_native_resolution(tmp_path):
    """Below-store-size images must NOT be upscaled at store time (the
    host pipeline never upscales before random-scale; baking in
    interpolation would be a distribution shift) — they land top-left
    pixel-exact with padding around."""
    class _Small:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            img = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3) % 200
            lab = np.arange(4 * 6, dtype=np.int32).reshape(4, 6) % 20
            return img, lab

    d = str(tmp_path / "s")
    write_shards(_Small(), d, store_size=(8, 8), ignore_label=255)
    reader = ShardReader(d)
    images, labels = reader.gather([0])
    ref_img, ref_lab = _Small()[0]
    np.testing.assert_array_equal(images[0, :4, :6], ref_img.astype(np.uint8))
    np.testing.assert_array_equal(labels[0, :4, :6], ref_lab.astype(np.uint8))
    assert (labels[0, 4:, :] == 255).all()
    assert (labels[0, :, 6:] == 255).all()


def test_padding_uses_ignore_label_and_mean_pixel(tmp_path):
    """A wide sample lands top-left (aspect preserved); the leftover rows
    are mean pixel / ignore label."""
    class _Wide:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return (np.full((8, 20, 3), 50, np.float32),
                    np.full((8, 20), 2, np.int32))

    d = str(tmp_path / "s")
    write_shards(_Wide(), d, store_size=(16, 20), mean_pixel=(7, 8, 9),
                 ignore_label=255)
    reader = ShardReader(d)
    images, labels = reader.gather([0])
    assert (images[0, :8, :] == 50).all()
    np.testing.assert_array_equal(images[0, 12, 12], [7, 8, 9])
    assert (labels[0, :8, :] == 2).all()
    assert (labels[0, 8:, :] == 255).all()


def test_gather_crosses_shard_boundaries(shard_dir):
    reader = ShardReader(shard_dir)
    assert len(reader) == 10
    images, labels = reader.gather([0, 3, 4, 9])  # shards 0, 0, 1, 2
    assert images.shape == (4, 48, 64, 3) and images.dtype == np.uint8
    assert labels.shape == (4, 48, 64) and labels.dtype == np.uint8
    # cross-check against a full sequential read
    all_images, _ = reader.gather(np.arange(10))
    for j, idx in enumerate([0, 3, 4, 9]):
        np.testing.assert_array_equal(images[j], all_images[idx])


def test_batches_shuffle_deterministic_and_exhaustive(shard_dir):
    reader = ShardReader(shard_dir)
    b1 = list(shard_batches(reader, 2, shuffle=True, seed=1, epoch=3))
    b2 = list(shard_batches(reader, 2, shuffle=True, seed=1, epoch=3))
    b3 = list(shard_batches(reader, 2, shuffle=True, seed=1, epoch=4))
    assert len(b1) == 5
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x["image"], y["image"])
    assert any(
        not np.array_equal(x["image"], y["image"]) for x, y in zip(b1, b3)
    )


def test_process_sharding_partitions_epoch(shard_dir):
    """Pod sharding: the two processes' samples partition the permutation
    (reference AutoShardPolicy.DATA, core_train.py:186-195)."""
    reader = ShardReader(shard_dir)
    seen = []
    for pi in range(2):
        for batch in shard_batches(
            reader, 1, shuffle=True, seed=0, epoch=0,
            process_index=pi, num_processes=2,
        ):
            seen.append(batch["image"][0].tobytes())
    assert len(seen) == 10
    assert len(set(seen)) == 10  # disjoint and exhaustive


def test_process_sharding_equalizes_step_counts(tmp_path):
    """Uneven sample counts must NOT give processes different batch counts
    (SPMD deadlock at the epoch boundary)."""
    d = str(tmp_path / "odd")
    write_shards(_SyntheticDataset(n=11), d, store_size=(48, 64),
                 samples_per_shard=4)
    reader = ShardReader(d)
    counts = []
    for pi in range(2):
        counts.append(len(list(shard_batches(
            reader, 2, shuffle=True, seed=0, epoch=0,
            process_index=pi, num_processes=2))))
    assert counts[0] == counts[1] == 2  # 11 // 2 = 5 samples -> 2 batches


def test_drop_remainder(shard_dir):
    reader = ShardReader(shard_dir)
    assert len(list(shard_batches(reader, 4, drop_remainder=True))) == 2
    batches = list(shard_batches(reader, 4, drop_remainder=False))
    assert len(batches) == 3 and batches[-1]["image"].shape[0] == 2


def test_train_from_disk_end_to_end(shard_dir, tmp_path):
    """CoreTrain consumes shard batches through device_augment: uint8 from
    disk -> on-device scale/crop/flip -> train step; loss finite."""
    import jax.numpy as jnp

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.env import EnvConfig, common_env_setup
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import CoreTrain
    from iseg_tpu.data.device_augment import (
        DeviceAugmentConfig,
        make_device_augment,
    )
    from iseg_tpu.nn.heads import SimpleDecoder

    env = common_env_setup(EnvConfig(random_seed=0))
    model = SegManaged(
        num_class=4,
        backbone=get_backbone("resnet9", output_stride=16),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    rng_shape = (1, 32, 32, 3)
    variables_tx, _ = get_optimizer(
        model.init(__import__("jax").random.PRNGKey(0),
                   jnp.zeros(rng_shape))["params"],
        "sgd", learning_rate=0.01, train_steps=10,
    )
    augment = make_device_augment(
        DeviceAugmentConfig(crop_size=(32, 32), ignore_label=255)
    )
    trainer = CoreTrain(
        env, model, variables_tx, input_shape=rng_shape,
        device_augment=augment, log_every=0,
    )
    dataset_fn = make_shard_dataset_fn(
        shard_dir, batch_size=8, seed=0, process_index=0, num_processes=1
    )
    history = trainer.train(dataset_fn, epochs=1, steps_per_epoch=1)
    assert np.isfinite(history[0]["loss"])
