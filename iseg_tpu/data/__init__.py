"""Data pipeline: augmentations, input normalization, loading.

Parity tier for the reference's ``data_process/`` package. Host-side
(numpy) per-sample augmentation — the analogue of the reference's tf.data
CPU pipeline — feeding fixed-shape batches to the device; a fused on-device
augment path for the hot recipe lives in ``iseg_tpu.data.device_augment``.
"""

from iseg_tpu.data.input_norm import (
    InputNormTypes,
    normalize_input,
    inverse_normalize_input,
    get_mean_pixel,
)
from iseg_tpu.data.pipeline import (
    AugmentationsPipeline,
    StandardAugmentationsPipeline,
)
from iseg_tpu.data.resident import DeviceResidentDataset
from iseg_tpu.data.shards import (
    ShardReader,
    make_shard_dataset_fn,
    shard_batches,
    write_shards,
)

__all__ = [
    "InputNormTypes",
    "normalize_input",
    "inverse_normalize_input",
    "get_mean_pixel",
    "AugmentationsPipeline",
    "StandardAugmentationsPipeline",
    "DeviceResidentDataset",
    "ShardReader",
    "make_shard_dataset_fn",
    "shard_batches",
    "write_shards",
]
