import numpy as np
import pytest

from iseg_tpu.data import (
    InputNormTypes,
    StandardAugmentationsPipeline,
    get_mean_pixel,
    inverse_normalize_input,
    normalize_input,
)
from iseg_tpu.data.augments import (
    PadAugment,
    PhotoMetricDistortionAugment,
    RandomCropAugment,
    RandomErasingAugment,
    RandomFlipAugment,
    RandomRotateAugment,
    RandomScaleAugment,
    ResizeMaxSizeAugment,
    JpegQualityAugment,
)


def _sample(h=40, w=60):
    rng = np.random.RandomState(0)
    image = rng.rand(h, w, 3).astype(np.float32) * 255
    label = rng.randint(0, 21, (h, w)).astype(np.int32)
    return image, label


def test_input_norm_roundtrip():
    image, _ = _sample()
    for mode in InputNormTypes:
        out = normalize_input(image, mode)
        back = inverse_normalize_input(out, mode)
        np.testing.assert_allclose(back, image, atol=1e-3)


def test_zero_mean_range():
    image = np.array([[[0.0, 127.5, 255.0]]])
    out = normalize_input(image, InputNormTypes.ZERO_MEAN)
    np.testing.assert_allclose(out, [[[-1, 0, 1]]])


def test_mean_pixel_normalizes_to_zero():
    for mode in (InputNormTypes.ZERO_MEAN, InputNormTypes.KERAS,
                 InputNormTypes.KERAS_SCALE):
        mp = get_mean_pixel(mode)
        out = normalize_input(mp[None, None], mode)
        np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_random_scale_discrete_steps():
    aug = RandomScaleAugment(0.5, 2.0, 0.25)
    rng = np.random.default_rng(0)
    image, label = _sample(40, 40)
    seen = set()
    for _ in range(50):
        img2, lab2 = aug(rng, image, label)
        assert img2.shape[:2] == lab2.shape[:2]
        seen.add(img2.shape[0])
    # scales land on the 0.25 grid: 40*{0.5,0.75,...,2.0}
    assert seen <= {20, 30, 40, 50, 60, 70, 80}
    assert len(seen) > 3


def test_pad_augment_fills_mean_and_ignore():
    image, label = _sample(10, 10)
    aug = PadAugment((16, 16), mean_pixel=[1.0, 2.0, 3.0], ignore_label=255)
    img2, lab2 = aug(np.random.default_rng(0), image, label)
    assert img2.shape == (16, 16, 3)
    np.testing.assert_allclose(img2[15, 15], [1.0, 2.0, 3.0])
    assert lab2[15, 15] == 255
    assert lab2[0, 0] == label[0, 0]


def test_random_crop_shape():
    image, label = _sample(40, 60)
    aug = RandomCropAugment((32, 32))
    img2, lab2 = aug(np.random.default_rng(0), image, label)
    assert img2.shape == (32, 32, 3)
    assert lab2.shape == (32, 32)


def test_flip_joint():
    image, label = _sample()
    aug = RandomFlipAugment(flip_prob=1.0)
    img2, lab2 = aug(np.random.default_rng(0), image, label)
    np.testing.assert_allclose(img2, image[:, ::-1])
    np.testing.assert_allclose(lab2, label[:, ::-1])


def test_resize_max_size():
    image, label = _sample(100, 200)
    aug = ResizeMaxSizeAugment(50)
    img2, lab2 = aug(np.random.default_rng(0), image, label)
    assert max(img2.shape[:2]) == 50
    assert img2.shape[:2] == lab2.shape[:2]


def test_random_erasing_writes_ignore():
    image, label = _sample(64, 64)
    aug = RandomErasingAugment(scale=(0.1, 0.2), ignore_label=255, prob=1.0)
    img2, lab2 = aug(np.random.default_rng(3), image.copy(), label.copy())
    assert (lab2 == 255).sum() > 0


def test_rotate_fills_ignore():
    image, label = _sample(32, 32)

    class FixedAngleRng:
        def uniform(self, lo, hi):
            return 30.0

        def random(self):
            return 0.0

    aug = RandomRotateAugment(max_angle=45.0, ignore_label=255)
    img2, lab2 = aug(FixedAngleRng(), image, label)
    assert img2.shape == image.shape
    assert (lab2 == 255).sum() > 0  # corners filled


def test_jpeg_quality_runs():
    image, label = _sample(32, 32)
    aug = JpegQualityAugment()
    img2, _ = aug(np.random.default_rng(0), image, label)
    assert img2.shape == image.shape
    assert img2.dtype == np.float32


def test_photometric_in_range():
    image, label = _sample()
    aug = PhotoMetricDistortionAugment()
    img2, _ = aug(np.random.default_rng(0), image, label)
    assert img2.min() >= 0 and img2.max() <= 255


def test_standard_pipeline_train_shapes_and_determinism():
    pipe = StandardAugmentationsPipeline(
        training=True, crop_size=(33, 33), random_erasing=True, seed=7
    )
    image, label = _sample(25, 50)  # smaller than crop -> needs padding
    img1, lab1 = pipe(image, label, sample_index=3)
    img2, lab2 = pipe(image, label, sample_index=3)
    assert img1.shape == (33, 33, 3)
    assert lab1.shape == (33, 33)
    np.testing.assert_allclose(img1, img2)  # deterministic per (seed, index)
    np.testing.assert_array_equal(lab1, lab2)
    img3, _ = pipe(image, label, sample_index=4)
    assert not np.allclose(img1, img3)  # different index -> different draw


def test_standard_pipeline_eval_pads_only():
    pipe = StandardAugmentationsPipeline(training=False, crop_size=(64, 64))
    image, label = _sample(40, 60)
    img, lab = pipe(image, label)
    assert img.shape == (64, 64, 3)
    # normalized mean-pixel padding is zero
    np.testing.assert_allclose(img[50:, :, :], 0.0, atol=1e-5)
    assert (lab[50:, :] == 255).all()


def test_batched_dataset_and_process_shard():
    from iseg_tpu.data.loader import batched_dataset

    class FakeDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.full((8, 8, 3), i, np.float32),
                    np.full((8, 8), i, np.int32))

    batches = list(batched_dataset(FakeDS(), batch_size=2))
    assert len(batches) == 5
    assert batches[0]["image"].shape == (2, 8, 8, 3)

    # 2-process sharding splits the data disjointly
    b0 = list(batched_dataset(FakeDS(), 1, process_index=0, num_processes=2))
    b1 = list(batched_dataset(FakeDS(), 1, process_index=1, num_processes=2))
    ids0 = {int(b["label"][0, 0, 0]) for b in b0}
    ids1 = {int(b["label"][0, 0, 0]) for b in b1}
    assert ids0 & ids1 == set()
    assert len(ids0 | ids1) == 10


def test_batched_dataset_equalizes_process_batch_counts():
    # an odd dataset size must NOT give one host an extra batch (its
    # collectives would hang the other hosts) — equalize like shards.py
    from iseg_tpu.data.loader import batched_dataset

    class OddDS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return (np.full((4, 4, 3), i, np.float32),
                    np.full((4, 4), i, np.int32))

    counts = [
        len(list(batched_dataset(
            OddDS(), batch_size=3, process_index=p, num_processes=2)))
        for p in (0, 1)
    ]
    assert counts[0] == counts[1], counts


def test_batched_dataset_unlabeled():
    # predict-only datasets yield label=None; the batch must omit labels
    # instead of crashing in np.stack
    from iseg_tpu.data.loader import batched_dataset

    class NoLabelDS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return np.full((4, 4, 3), i, np.float32), None

    batches = list(batched_dataset(NoLabelDS(), batch_size=2))
    assert len(batches) == 1
    assert "label" not in batches[0]
    assert batches[0]["image"].shape == (2, 4, 4, 3)


def test_random_erasing_does_not_mutate_inputs():
    from iseg_tpu.data.augments import RandomErasingAugment

    rng = np.random.default_rng(0)
    image = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32) * 255
    label = np.random.RandomState(1).randint(0, 5, (16, 16)).astype(np.int32)
    image_before, label_before = image.copy(), label.copy()
    aug = RandomErasingAugment(prob=1.0)
    out_i, out_l = aug.call(rng, image, label)
    np.testing.assert_array_equal(image, image_before)
    np.testing.assert_array_equal(label, label_before)
    assert (out_l == 255).any()  # the erase did happen, on a copy


def test_hue_rotation_uses_full_circle_convention():
    # tf.image.adjust_hue's delta is a fraction of the FULL hue circle:
    # two applications of delta=0.5 are a 720-degree rotation == identity
    # (under the old half-circle convention they compose to a complement)
    from iseg_tpu.data.augments import RandomHueAugment

    class FixedRng:
        def uniform(self, lo, hi):
            return hi  # always draw +max_delta

    # low saturation keeps the rotated chroma inside the RGB gamut (the
    # augment clips to [0, 255], which would break the round trip)
    image = np.random.RandomState(2).rand(8, 8, 3).astype(np.float32) * 40 + 100
    aug = RandomHueAugment(max_delta=0.5, prob=1.0)
    once, _ = aug.call(FixedRng(), image.copy(), None)
    twice, _ = aug.call(FixedRng(), once, None)
    assert np.abs(once - image).max() > 5.0  # the rotation is nontrivial
    np.testing.assert_allclose(twice, image, atol=0.3)
