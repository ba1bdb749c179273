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

Pod mode: pass ``process_index``/``num_processes`` (or leave ``"auto"``
to read ``jax.process_index()``) — each host uploads only its equal-sized
partition of the samples and shuffles it locally per epoch, the resident
analogue of ``AutoShardPolicy.DATA`` (partition once at upload, shuffle
within the partition).

Batch selection is computed on host (cheap, index-only) so the gather
indices stay static-shaped.
"""

from __future__ import annotations

from typing import Iterator, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _gather(images, labels, idx):
    return jnp.take(images, idx, axis=0), jnp.take(labels, idx, axis=0)


class DeviceResidentDataset:
    """Upload a :class:`~iseg_tpu.data.shards.ShardReader` (or raw
    ``(images, labels)`` arrays) to device memory; serve batches as
    on-device gathers.

    ``sharding``/``device`` optionally place the resident arrays;
    ``process_index``/``num_processes`` select this host's equal-sized
    sample partition for multi-host training ("auto" = the JAX process
    grid; pass explicit ints for testing)."""

    def __init__(self, source, sharding=None, device=None,
                 chunk_samples: int = 512,
                 process_index: Union[int, str, None] = "auto",
                 num_processes: Union[int, str, None] = "auto"):
        target = sharding or device

        if process_index == "auto":
            process_index = jax.process_index()
        if num_processes == "auto":
            num_processes = jax.process_count()
        process_index = int(process_index or 0)
        num_processes = int(num_processes or 1)

        def put(x):
            return jax.device_put(x, target) if target else jax.device_put(x)

        if hasattr(source, "gather"):  # ShardReader
            local = _process_partition(len(source), process_index,
                                       num_processes)
            # chunked upload: peak host RAM stays at chunk size, the
            # device array is assembled by one concatenate
            img_chunks, lab_chunks = [], []
            for start in range(0, len(local), chunk_samples):
                idx = local[start : start + chunk_samples]
                images, labels = source.gather(idx)
                img_chunks.append(put(images))
                lab_chunks.append(put(labels))
            self.images = (img_chunks[0] if len(img_chunks) == 1
                           else jnp.concatenate(img_chunks, axis=0))
            self.labels = (lab_chunks[0] if len(lab_chunks) == 1
                           else jnp.concatenate(lab_chunks, axis=0))
            self.num_samples = len(local)
        else:
            images, labels = source
            local = _process_partition(int(images.shape[0]), process_index,
                                       num_processes)
            self.images = put(np.ascontiguousarray(images[local]))
            self.labels = put(np.ascontiguousarray(labels[local]))
            self.num_samples = len(local)
        self.process_index = process_index
        self.num_processes = num_processes

    def nbytes(self) -> int:
        return self.images.nbytes + self.labels.nbytes

    def epoch_indices(self, epoch: int, seed: int = 0,
                      shuffle: bool = True) -> np.ndarray:
        order = np.arange(self.num_samples)
        if shuffle:
            # single-process: same stream as shards.shard_batches, so the
            # resident path serves bit-identical batches to the host path
            # (tested). Multi-process: fold the process index so hosts
            # draw different local orders over their disjoint partitions.
            key = ((seed, epoch) if self.num_processes == 1
                   else (seed, epoch, self.process_index))
            np.random.default_rng(key).shuffle(order)
        return order

    def index_batches(self, batch_size: int, epoch: int = 0, seed: int = 0,
                      shuffle: bool = True,
                      drop_remainder: bool = True) -> Iterator[np.ndarray]:
        """Yield per-batch ``[batch]`` int index vectors (host numpy) over
        the same epoch stream as :meth:`batches` — the input for the fused
        single-program path (``core.train.make_resident_train_step``)."""
        order = self.epoch_indices(epoch, seed, shuffle)
        for start in range(0, len(order), batch_size):
            chunk = order[start : start + batch_size]
            if len(chunk) < batch_size and drop_remainder:
                return
            yield chunk

    def batches(self, batch_size: int, epoch: int = 0, seed: int = 0,
                shuffle: bool = True,
                drop_remainder: bool = True) -> Iterator[dict]:
        """Yield ``{"image", "label"}`` batches of DEVICE arrays (uint8).

        The gather is a module-level jitted function (compiled once per
        process); each call ships only a [batch] int32 index vector."""
        for chunk in self.index_batches(batch_size, epoch, seed, shuffle,
                                        drop_remainder):
            image, label = _gather(self.images, self.labels,
                                   jnp.asarray(chunk, jnp.int32))
            yield {"image": image, "label": label}

    def dataset_fn(self, batch_size: int, seed: int = 0,
                   shuffle: bool = True):
        """``dataset_fn(epoch)`` for ``CoreTrain.train``."""

        def fn(epoch: int) -> Iterator[dict]:
            return self.batches(batch_size, epoch=epoch, seed=seed,
                                shuffle=shuffle)

        return fn

    def index_dataset_fn(self, batch_size: int, seed: int = 0,
                         shuffle: bool = True):
        """``dataset_fn(epoch)`` for ``CoreTrain(resident_dataset=self)``:
        yields ``{"index": [batch] int}`` batches; the gather + augment +
        step run as one compiled program on device."""

        def fn(epoch: int) -> Iterator[dict]:
            for chunk in self.index_batches(batch_size, epoch=epoch,
                                            seed=seed, shuffle=shuffle):
                yield {"index": chunk}

        return fn


def _process_partition(n: int, process_index: int,
                       num_processes: int) -> np.ndarray:
    """This process's equal-sized slice of ``range(n)`` (strided, truncated
    to ``n // num_processes`` so all hosts run the same step count — the
    same equalization as ``shards.shard_batches``)."""
    per = n // num_processes
    if per == 0:
        raise ValueError(
            f"{n} samples cannot be partitioned over {num_processes} "
            "processes")
    return np.arange(n)[process_index::num_processes][:per]
