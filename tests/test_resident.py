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


def test_fused_resident_step_matches_separate(shard_dir):
    """make_resident_train_step (ONE compiled program: gather + augment +
    step) reproduces the separate-dispatch path (gather program, augment
    program, train program) over the same epoch stream and RNG
    derivations.

    Step 1 must agree to float-rounding precision (same params, same RNG
    keys, same sample stream — any logic bug would show here). Later
    steps drift by last-ulp differences from XLA fusing the augment chain
    into the step program, amplified through SGD updates, so they get a
    looser numeric bound."""
    import jax
    import jax.numpy as jnp

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import (
        _AUGMENT_STREAM,
        create_train_state,
        make_resident_train_step,
        make_train_step,
    )
    from iseg_tpu.data.device_augment import (
        DeviceAugmentConfig,
        make_device_augment,
    )
    from iseg_tpu.nn.heads import SimpleDecoder

    model = SegManaged(
        num_class=4,
        backbone=get_backbone("resnet9", output_stride=16),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 32, 32, 3)))
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.05,
                          train_steps=10)
    loss_fn = model.build_loss_fn()
    aug = make_device_augment(
        DeviceAugmentConfig(crop_size=(32, 32), ignore_label=255))

    def augment_and_norm(key, images_u8, labels_i32):
        images, labels = aug(key, images_u8, labels_i32)
        return (images - 127.5) / 127.5, labels

    ds = DeviceResidentDataset(ShardReader(shard_dir))

    def init_state():
        return create_train_state(model, rng, (1, 32, 32, 3), tx,
                                  variables=variables)

    # separate-dispatch path (CoreTrain's non-resident device_augment
    # branch, replayed by hand)
    state_a = init_state()
    parts_a = []
    host_step = 0
    for epoch in range(2):
        for b in ds.batches(4, epoch=epoch, seed=7):
            aug_rng = jax.random.fold_in(
                jax.random.fold_in(rng, _AUGMENT_STREAM), host_step)
            image, label = augment_and_norm(
                aug_rng, b["image"], b["label"].astype(jnp.int32))
            state_a, parts = make_train_step(loss_fn, donate=False)(
                state_a, {"image": image, "label": label}, rng)
            parts_a.append(float(parts["loss"]))
            host_step += 1

    # fused single-program path over the same index stream
    state_b = init_state()
    fused = make_resident_train_step(loss_fn, ds.images, ds.labels,
                                     augment_fn=augment_and_norm,
                                     donate=False)
    parts_b = []
    for epoch in range(2):
        for idx in ds.index_batches(4, epoch=epoch, seed=7):
            state_b, parts = fused(state_b, idx, rng)
            parts_b.append(float(parts["loss"]))

    # step 1: identical params, so only cross-program fusion rounding
    np.testing.assert_allclose(parts_a[0], parts_b[0], rtol=1e-5)
    # later steps: rounding drift compounds through SGD updates
    np.testing.assert_allclose(parts_a, parts_b, rtol=2e-3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-2,
                                                atol=1e-3),
        state_a.params, state_b.params)


def test_core_train_resident_fused_matches_separate(shard_dir):
    """CoreTrain(resident_dataset=ds) + index_dataset_fn trains to the
    same parameters as the separate-dispatch resident path (dataset_fn +
    device_augment), same seed."""
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
    augment = make_device_augment(
        DeviceAugmentConfig(crop_size=(32, 32), ignore_label=255))
    ds = DeviceResidentDataset(ShardReader(shard_dir))

    def run(fused: bool):
        model = SegManaged(
            num_class=4,
            backbone=get_backbone("resnet9", output_stride=16),
            head=SimpleDecoder(filters=16, low_level_filters=8),
        )
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
        tx, _ = get_optimizer(variables["params"], "sgd",
                              learning_rate=0.05, train_steps=10)
        trainer = CoreTrain(
            env, model, tx, input_shape=(1, 32, 32, 3),
            device_augment=augment, log_every=0, variables=variables,
            resident_dataset=ds if fused else None,
        )
        dataset_fn = (ds.index_dataset_fn(batch_size=8) if fused
                      else ds.dataset_fn(batch_size=8))
        history = trainer.train(dataset_fn, epochs=1, steps_per_epoch=2)
        assert np.isfinite(history[0]["loss"])
        return history[0]["loss"], trainer.state.params

    loss_sep, params_sep = run(fused=False)
    loss_fused, params_fused = run(fused=True)
    np.testing.assert_allclose(loss_sep, loss_fused, rtol=1e-4)
    # cross-program fusion rounding drifts params by ~1e-5 over 2 SGD
    # steps; a wrong RNG stream / index stream would diverge far more
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-3,
                                                atol=1e-4),
        params_sep, params_fused)


@pytest.fixture(scope="module")
def raw_source():
    """8 raw samples (divisible by the 8-device mesh) for sharded tests."""
    rng = np.random.RandomState(99)
    images = rng.randint(0, 256, (8, 32, 48, 3)).astype(np.uint8)
    labels = rng.randint(0, 4, (8, 32, 48)).astype(np.uint8)
    return images, labels


def test_sharded_upload_splits_samples_across_devices(raw_source):
    import jax

    from iseg_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    ds = DeviceResidentDataset(raw_source, mesh=mesh)
    assert ds.num_samples == 8
    np.testing.assert_array_equal(np.asarray(ds.images), raw_source[0])
    shard_sizes = [s.data.shape[0] for s in ds.images.addressable_shards]
    assert shard_sizes == [1] * jax.device_count()


def test_sharded_upload_truncates_uneven(shard_dir):
    """10 samples over an 8-way sample sharding -> equalized to 8 (same
    drop-remainder semantics as the process partition)."""
    from iseg_tpu.parallel.mesh import create_mesh

    ds = DeviceResidentDataset(ShardReader(shard_dir), mesh=create_mesh())
    assert ds.num_samples == 8


def test_sharded_chunked_upload_matches(raw_source):
    """Chunked upload (chunk rounded to the shard count) assembles the
    same sharded array as one-shot upload."""
    from iseg_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    one = DeviceResidentDataset(raw_source, mesh=mesh)
    # ShardReader-style source forcing several chunks
    class _Src:
        def __len__(self):
            return 8

        def gather(self, idx):
            return raw_source[0][idx], raw_source[1][idx]

    chunked = DeviceResidentDataset(_Src(), mesh=mesh, chunk_samples=3)
    np.testing.assert_array_equal(np.asarray(one.images),
                                  np.asarray(chunked.images))
    assert chunked.images.sharding == one.images.sharding


def test_sharded_fused_step_matches_unsharded(raw_source):
    """The fused step over a sample-sharded dataset computes the same
    step-1 loss as over the single-device dataset — GSPMD assembles the
    identical batch from the owning chips. The compiled program must not
    all-gather the dataset itself (only the [batch] index vector)."""
    import jax
    import jax.numpy as jnp

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import (
        create_train_state,
        make_resident_train_step,
    )
    from iseg_tpu.nn.heads import SimpleDecoder
    from iseg_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    model = SegManaged(
        num_class=4,
        backbone=get_backbone("resnet9", output_stride=16),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 32, 48, 3)))
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.05,
                          train_steps=10)
    loss_fn = model.build_loss_fn()

    def norm(key, images_u8, labels_i32):
        return (images_u8.astype(jnp.float32) - 127.5) / 127.5, labels_i32

    def one_step(ds, mesh_arg):
        state = create_train_state(model, rng, (1, 32, 48, 3), tx,
                                   variables=variables)
        step = make_resident_train_step(loss_fn, ds.images, ds.labels,
                                        augment_fn=norm, donate=False,
                                        mesh=mesh_arg)
        _, parts = step(state, np.arange(8), rng)
        return float(parts["loss"])

    plain = one_step(DeviceResidentDataset(raw_source), None)
    sharded = one_step(DeviceResidentDataset(raw_source, mesh=mesh), mesh)
    np.testing.assert_allclose(plain, sharded, rtol=1e-5)


def test_sharded_gather_never_materializes_dataset(raw_source):
    """HLO-level property: with the dataset sample-sharded, the only
    all-gather in the gather program is the index vector — per-step ICI
    traffic is one batch, never the resident arrays."""
    import jax
    import jax.numpy as jnp

    from iseg_tpu.parallel.mesh import batch_sharding, create_mesh

    mesh = create_mesh()
    ds = DeviceResidentDataset(raw_source, mesh=mesh)

    @jax.jit
    def gather_batch(res, idx):
        out = jnp.take(res, idx, axis=0)
        return jax.lax.with_sharding_constraint(
            out, batch_sharding(mesh, out.ndim))

    idx = jnp.arange(8, dtype=jnp.int32)
    hlo = gather_batch.lower(ds.images, idx).compile().as_text()
    gathers = [l for l in hlo.splitlines() if "all-gather" in l
               and "= u8[" in l.replace(" ", "")]
    assert not gathers, f"dataset-typed all-gather in HLO: {gathers}"


def test_core_train_sharded_resident(raw_source):
    """CoreTrain over a mesh-sharded resident dataset trains (loss finite,
    params replicated over the mesh afterwards)."""
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
    ds = DeviceResidentDataset(raw_source, mesh=env.mesh)
    model = SegManaged(
        num_class=4,
        backbone=get_backbone("resnet9", output_stride=16),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 3)))
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.05,
                          train_steps=10)
    augment = make_device_augment(
        DeviceAugmentConfig(crop_size=(32, 32), ignore_label=255))
    trainer = CoreTrain(
        env, model, tx, input_shape=(1, 32, 48, 3),
        device_augment=augment, log_every=0, variables=variables,
        resident_dataset=ds,
    )
    history = trainer.train(ds.index_dataset_fn(batch_size=8), epochs=1,
                            steps_per_epoch=1)
    assert np.isfinite(history[0]["loss"])
