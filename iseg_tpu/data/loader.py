"""Dataset loading + batching.

Parity with the reference's ``utils/data_loader.py`` (PNG/JPEG image +
label-PNG loading :11-33) and the dataset plumbing of ``core_train.py``
(shuffle -> repeat -> batch(drop_remainder) -> shard -> prefetch :155-195).

Multi-host (pod) sharding: ``process_shard`` mirrors ``AutoShardPolicy.DATA``
— each host reads every len(files)/num_processes-th sample.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

try:
    from PIL import Image as _PILImage

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def load_image(path: str) -> np.ndarray:
    """RGB image -> float32 [H, W, 3] in [0, 255]
    (reference ``utils/data_loader.py:11``)."""
    if not _HAS_PIL:
        raise ImportError("PIL required for image loading")
    return np.asarray(_PILImage.open(path).convert("RGB"), np.float32)


def load_label(path: str) -> np.ndarray:
    """Label PNG -> int32 [H, W] (reference ``utils/data_loader.py:33``)."""
    if not _HAS_PIL:
        raise ImportError("PIL required for label loading")
    return np.asarray(_PILImage.open(path), np.int32)


def list_images(directory: str) -> list[str]:
    """Sorted image paths (reference ``core_predict.py:173-192``)."""
    out = []
    for name in sorted(os.listdir(directory)):
        if os.path.splitext(name)[1].lower() in IMAGE_EXTS:
            out.append(os.path.join(directory, name))
    return out


class SegDirectoryDataset:
    """(image_dir, label_dir) paired dataset; labels matched by basename."""

    def __init__(self, image_dir: str, label_dir: Optional[str] = None,
                 label_ext: str = ".png"):
        self.image_paths = list_images(image_dir)
        self.label_paths = None
        if label_dir is not None:
            self.label_paths = [
                os.path.join(
                    label_dir,
                    os.path.splitext(os.path.basename(p))[0] + label_ext,
                )
                for p in self.image_paths
            ]

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, i):
        image = load_image(self.image_paths[i])
        label = load_label(self.label_paths[i]) if self.label_paths else None
        return image, label


def batched_dataset(
    dataset,
    batch_size: int,
    pipeline: Optional[Callable] = None,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    drop_remainder: bool = True,
    process_index: int = 0,
    num_processes: int = 1,
) -> Iterator[dict]:
    """Yield {"image": [N,H,W,3] fp32, "label": [N,H,W] int32} host batches.

    ``process_shard`` (`process_index`/`num_processes`) mirrors the
    reference's pod ``AutoShardPolicy.DATA`` (``core_train.py:186-195``).
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng((seed, epoch)).shuffle(order)
    order = order[process_index::num_processes]

    images, labels = [], []
    for idx in order:
        image, label = dataset[int(idx)]
        if pipeline is not None:
            image, label = pipeline(image, label, sample_index=int(idx) + epoch * len(dataset))
        images.append(image)
        labels.append(label)
        if len(images) == batch_size:
            yield {
                "image": np.stack(images).astype(np.float32),
                "label": np.stack(labels).astype(np.int32),
            }
            images, labels = [], []
    if images and not drop_remainder:
        yield {
            "image": np.stack(images).astype(np.float32),
            "label": np.stack(labels).astype(np.int32),
        }
