import numpy as np
import pytest

from iseg_tpu.data.tf_feeder import iterate_tf_dataset


class FakeTFDataset:
    """Stub exposing the as_numpy_iterator() surface the adapter uses."""

    def __init__(self, elements):
        self._elements = elements

    def as_numpy_iterator(self):
        return iter(self._elements)


def test_iterate_tuple_elements():
    ds = FakeTFDataset([
        (np.ones((2, 4, 4, 3), np.uint8), np.zeros((2, 4, 4, 1), np.uint8)),
    ])
    batches = list(iterate_tf_dataset(ds))
    assert batches[0]["image"].dtype == np.float32
    assert batches[0]["label"].shape == (2, 4, 4)  # trailing 1 squeezed
    assert batches[0]["label"].dtype == np.int32


def test_iterate_dict_elements_with_map_fn():
    ds = FakeTFDataset([
        {"image": np.full((1, 2, 2, 3), 255.0), "label": np.ones((1, 2, 2))},
    ])
    batches = list(iterate_tf_dataset(
        ds, map_fn=lambda i, l: (i / 255.0, l)))
    np.testing.assert_allclose(batches[0]["image"], 1.0)


def test_tfrecord_variable_size_records_batch_with_pad_to(tmp_path):
    """The normal VOC/Cityscapes case: records of DIFFERENT sizes must
    batch when pad_to is given (shrink-to-fit + mean/ignore padding —
    raw batching of dynamic shapes is a tf.data error)."""
    tf = pytest.importorskip("tensorflow")

    def encode(img, lab):
        feats = {
            "image/encoded": tf.train.Feature(bytes_list=tf.train.BytesList(
                value=[tf.io.encode_png(img).numpy()])),
            "image/segmentation/class/encoded": tf.train.Feature(
                bytes_list=tf.train.BytesList(
                    value=[tf.io.encode_png(lab).numpy()])),
        }
        return tf.train.Example(
            features=tf.train.Features(feature=feats)).SerializeToString()

    rng = np.random.RandomState(0)
    path = str(tmp_path / "data-00000.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        for hw in ((6, 9), (12, 5)):  # two different sizes
            img = rng.randint(0, 255, (*hw, 3)).astype(np.uint8)
            lab = rng.randint(0, 20, (*hw, 1)).astype(np.uint8)
            w.write(encode(img, lab))

    from iseg_tpu.data.tf_feeder import tfrecord_seg_dataset

    batches = list(tfrecord_seg_dataset(
        str(tmp_path / "data-*"), batch_size=2, shuffle=False,
        pad_to=(12, 12), ignore_label=255, mean_pixel=(1.0, 2.0, 3.0)))
    assert len(batches) == 1
    assert batches[0]["image"].shape == (2, 12, 12, 3)
    assert batches[0]["label"].shape == (2, 12, 12)
    # the 6x9 record sits top-left unscaled; padding is mean/ignore
    assert (batches[0]["label"][0, 6:, :] == 255).all()
    np.testing.assert_allclose(batches[0]["image"][0, -1, -1], [1.0, 2.0, 3.0])
