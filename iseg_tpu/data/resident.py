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

Multi-chip mode: pass ``mesh=`` — the resident arrays are sharded over the
mesh's data axis on the SAMPLE dimension, so the dataset splits across the
chips' HBM (VOC train-aug at 8.4 GB is ~1 GB/chip on a v5e-8) instead of
replicating. The fused step's gather then assembles each global batch over
ICI: GSPMD lowers ``take`` from a sample-sharded operand to an all-gather
of the [batch] INDEX vector + a masked local gather + one batch-sized
all-reduce — per-step interconnect traffic is one uint8 batch, never the
dataset (verified in the compiled HLO, tests/test_resident.py). Composes
with DP training (the gathered batch is constrained back onto the data
axis). ``mesh`` and ``process_index`` compose on a pod: each host's
partition shards over its mesh slice.

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

    ``mesh`` shards the resident arrays over the mesh's data axis on the
    sample dimension (dataset split across chip HBM — see module doc);
    ``sharding``/``device`` optionally place them explicitly instead.
    ``process_index``/``num_processes`` select this host's equal-sized
    sample partition for multi-host training ("auto" = the JAX process
    grid; pass explicit ints for testing)."""

    def __init__(self, source, sharding=None, device=None, mesh=None,
                 chunk_samples: int = 512,
                 process_index: Union[int, str, None] = "auto",
                 num_processes: Union[int, str, None] = "auto"):
        n_dev_shards = 1
        if mesh is not None:
            if sharding is not None or device is not None:
                raise ValueError("pass mesh= OR sharding=/device=, not both")
            from jax.sharding import NamedSharding, PartitionSpec

            from iseg_tpu.parallel.mesh import DATA_AXIS

            # P(DATA_AXIS) shards dim 0 (samples) and replicates the rest,
            # valid for both [N,H,W,3] images and [N,H,W] labels
            sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
            n_dev_shards = mesh.shape[DATA_AXIS]
            # device_put needs the sample count divisible by the shard
            # count; round the chunk size too so every chunk divides
            chunk_samples = max(n_dev_shards,
                                chunk_samples - chunk_samples % n_dev_shards)
        target = sharding or device
        self.sharding = sharding
        self.mesh = mesh

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
            local = _truncate_to_multiple(local, n_dev_shards)
            # chunked upload: peak host RAM stays at chunk size, the
            # device array is assembled by one concatenate
            img_chunks, lab_chunks = [], []
            for start in range(0, len(local), chunk_samples):
                idx = local[start : start + chunk_samples]
                images, labels = source.gather(idx)
                img_chunks.append(put(images))
                lab_chunks.append(put(labels))
            self.images = _concat(img_chunks, sharding)
            self.labels = _concat(lab_chunks, sharding)
            self.num_samples = len(local)
        else:
            images, labels = source
            local = _process_partition(int(images.shape[0]), process_index,
                                       num_processes)
            local = _truncate_to_multiple(local, n_dev_shards)
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


def _concat(chunks, sharding):
    """Concatenate uploaded chunks into the resident array, pinning the
    requested sharding on the result (eager concatenate would let GSPMD
    pick its own layout for the output)."""
    if len(chunks) == 1:
        return chunks[0]
    if sharding is None:
        return jnp.concatenate(chunks, axis=0)
    return jax.jit(lambda *cs: jnp.concatenate(cs, axis=0),
                   out_shardings=sharding)(*chunks)


def _truncate_to_multiple(local: np.ndarray, k: int) -> np.ndarray:
    """Drop the tail so ``len(local)`` divides the device-shard count
    (sample-axis sharding needs equal per-device slices; same equalization
    as drop_remainder / the process partition)."""
    if k <= 1 or len(local) % k == 0:
        return local
    if len(local) < k:
        raise ValueError(
            f"{len(local)} samples cannot be sample-sharded over {k} "
            "devices")
    return local[: len(local) - len(local) % k]


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
