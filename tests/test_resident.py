"""Device-resident dataset: on-device gather batches match the host shard
path, epoch shuffles are deterministic, CoreTrain integration works."""

import numpy as np
import pytest

from iseg_tpu.data.resident import DeviceResidentDataset
from iseg_tpu.data.shards import ShardReader, shard_batches, write_shards


class _SyntheticDataset:
    def __init__(self, n=10, hw=(32, 48), num_class=4):
        self.n, self.hw, self.num_class = n, hw, num_class

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        h, w = self.hw
        return (rng.randint(0, 256, (h, w, 3)).astype(np.float32),
                rng.randint(0, self.num_class, (h, w)).astype(np.int32))


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("resident_shards"))
    write_shards(_SyntheticDataset(), d, store_size=(32, 48),
                 samples_per_shard=4)
    return d


def test_upload_matches_reader(shard_dir):
    reader = ShardReader(shard_dir)
    ds = DeviceResidentDataset(reader)
    assert ds.num_samples == 10
    images, labels = reader.gather(np.arange(10))
    np.testing.assert_array_equal(np.asarray(ds.images), images)
    np.testing.assert_array_equal(np.asarray(ds.labels), labels)


def test_chunked_upload_matches(shard_dir):
    reader = ShardReader(shard_dir)
    ds = DeviceResidentDataset(reader, chunk_samples=3)  # forces 4 chunks
    images, _ = reader.gather(np.arange(10))
    np.testing.assert_array_equal(np.asarray(ds.images), images)


def test_batches_match_host_shard_path(shard_dir):
    """Same (seed, epoch) -> the resident gather serves the exact batches
    the host shard_batches path serves."""
    reader = ShardReader(shard_dir)
    ds = DeviceResidentDataset(reader)
    host = list(shard_batches(reader, 4, shuffle=True, seed=3, epoch=2))
    dev = list(ds.batches(4, epoch=2, seed=3))
    assert len(host) == len(dev) == 2
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb["image"], np.asarray(db["image"]))
        np.testing.assert_array_equal(hb["label"], np.asarray(db["label"]))


def test_batches_are_device_arrays(shard_dir):
    import jax

    ds = DeviceResidentDataset(ShardReader(shard_dir))
    batch = next(iter(ds.batches(4)))
    assert isinstance(batch["image"], jax.Array)
    assert batch["image"].dtype == np.uint8


def test_pod_partition_disjoint_and_equal(shard_dir):
    """Each process uploads a disjoint, equal-sized partition; together
    with local shuffles, no sample is trained twice per epoch across
    hosts."""
    reader = ShardReader(shard_dir)
    seen = []
    sizes = []
    for pi in range(2):
        ds = DeviceResidentDataset(reader, process_index=pi, num_processes=2)
        sizes.append(ds.num_samples)
        for batch in ds.batches(1, epoch=0, seed=0):
            seen.append(np.asarray(batch["image"][0]).tobytes())
    assert sizes == [5, 5]
    assert len(set(seen)) == 10  # disjoint and (n even) exhaustive


def test_pod_partition_uneven_truncates_equally(shard_dir):
    reader = ShardReader(shard_dir)  # 10 samples
    sizes = [DeviceResidentDataset(reader, process_index=pi,
                                   num_processes=3).num_samples
             for pi in range(3)]
    assert sizes == [3, 3, 3]


def test_core_train_with_resident_dataset(shard_dir):
    import jax
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

    env = common_env_setup(EnvConfig())
    model = SegManaged(
        num_class=4,
        backbone=get_backbone("resnet9", output_stride=16),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.01,
                          train_steps=10)
    augment = make_device_augment(
        DeviceAugmentConfig(crop_size=(32, 32), ignore_label=255))
    trainer = CoreTrain(
        env, model, tx, input_shape=(1, 32, 32, 3),
        device_augment=augment, log_every=0,
    )
    ds = DeviceResidentDataset(ShardReader(shard_dir))
    history = trainer.train(ds.dataset_fn(batch_size=8), epochs=1,
                            steps_per_epoch=1)
    assert np.isfinite(history[0]["loss"])
