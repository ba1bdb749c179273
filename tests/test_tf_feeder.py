import numpy as np

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
