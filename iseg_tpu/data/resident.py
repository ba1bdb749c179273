"""Device-resident dataset: train at chip rate when the dataset fits HBM.

Segmentation datasets are small by HBM standards (PASCAL VOC train-aug at
512^2 uint8 = ~8.4 GB; a v5e chip has 16 GB), so the TPU-native answer to
host-input bottlenecks is to not have host input in the steady state: the
pre-decoded uint8 shards (``data/shards.py``) are uploaded ONCE, and every
training batch is an on-device gather + fused augment — zero host->HBM
traffic per step. The reference has no equivalent (tf.data re-feeds every
epoch, ``core_train.py:155-183``); this is a capability the TPU design
adds, and the only way to reach chip-rate training on hosts whose DMA link
is slower than the model step (measured on this rig: ~44 MB/s tunnel
DMA caps any streaming path at ~52 img/s vs the 273 img/s step rate —
BENCH_NOTES round 3).

Batch selection uses ``jax.random.permutation`` folded per epoch, computed
on host (cheap, index-only) so the gather indices stay static-shaped.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


class DeviceResidentDataset:
    """Upload a :class:`~iseg_tpu.data.shards.ShardReader` (or raw arrays)
    to device memory; serve batches as on-device gathers.

    ``sharding`` optionally places the sample axis over a mesh (pod mode:
    each process uploads only its ``process_shard`` of samples).
    """

    def __init__(self, source, sharding=None, device=None,
                 chunk_samples: int = 512):
        target = sharding or device

        def put(x):
            return jax.device_put(x, target) if target else jax.device_put(x)

        if hasattr(source, "gather"):  # ShardReader
            n = len(source)
            # chunked upload: peak host RAM stays at chunk size, the
            # device array is assembled by one concatenate
            img_chunks, lab_chunks = [], []
            for start in range(0, n, chunk_samples):
                idx = np.arange(start, min(start + chunk_samples, n))
                images, labels = source.gather(idx)
                img_chunks.append(put(images))
                lab_chunks.append(put(labels))
            self.images = (img_chunks[0] if len(img_chunks) == 1
                           else jnp.concatenate(img_chunks, axis=0))
            self.labels = (lab_chunks[0] if len(lab_chunks) == 1
                           else jnp.concatenate(lab_chunks, axis=0))
            self.num_samples = n
        else:
            images, labels = source
            self.images = put(np.ascontiguousarray(images))
            self.labels = put(np.ascontiguousarray(labels))
            self.num_samples = int(images.shape[0])

    def nbytes(self) -> int:
        return self.images.nbytes + self.labels.nbytes

    def epoch_indices(self, epoch: int, seed: int = 0,
                      shuffle: bool = True) -> np.ndarray:
        order = np.arange(self.num_samples)
        if shuffle:
            np.random.default_rng((seed, epoch)).shuffle(order)
        return order

    def batches(self, batch_size: int, epoch: int = 0, seed: int = 0,
                shuffle: bool = True,
                drop_remainder: bool = True) -> Iterator[dict]:
        """Yield ``{"image", "label"}`` batches of DEVICE arrays (uint8).

        The gather is jitted once; each call ships only a [batch] int32
        index vector to the device."""
        gather = _gather_jit()
        order = self.epoch_indices(epoch, seed, shuffle)
        for start in range(0, len(order), batch_size):
            chunk = order[start : start + batch_size]
            if len(chunk) < batch_size and drop_remainder:
                return
            image, label = gather(self.images, self.labels,
                                  jnp.asarray(chunk, jnp.int32))
            yield {"image": image, "label": label}

    def dataset_fn(self, batch_size: int, seed: int = 0,
                   shuffle: bool = True):
        """``dataset_fn(epoch)`` for ``CoreTrain.train``."""

        def fn(epoch: int) -> Iterator[dict]:
            return self.batches(batch_size, epoch=epoch, seed=seed,
                                shuffle=shuffle)

        return fn


def _gather_jit():
    @jax.jit
    def gather(images, labels, idx):
        return jnp.take(images, idx, axis=0), jnp.take(labels, idx, axis=0)

    return gather
