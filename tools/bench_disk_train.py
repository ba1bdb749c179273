"""End-to-end disk-fed training benchmark (VERDICT r2 next-round #1).

Headline config (ResNet-50 + ASPP, 512^2, bf16, batch 16, fused loss), fed
from PRE-DECODED uint8 SHARDS ON DISK through two production input paths:

default (streaming):
  memmap shard gather (host) -> device_prefetch (host->HBM DMA overlap)
  -> on-device fused augment (random scale/crop/flip) -> input norm
  -> train step

BENCH_MODE=resident (device-resident, for datasets that fit HBM):
  one-time shard upload -> per-step on-device gather -> fused augment
  -> input norm -> train step  (zero host->HBM traffic per step)

BENCH_MODE=resident_fused (resident + single-program step):
  same, but gather + augment + norm + train step dispatch as ONE compiled
  program (core.train.make_resident_train_step) — the host ships only a
  [batch] int32 index vector per step

vs. the synthetic-tensor headline (bench.py). Prints one JSON line per
config. Run on the TPU host:  python tools/bench_disk_train.py
"""

import json
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_shards(shard_dir: str, n: int, hw: int, num_class: int) -> None:
    from iseg_tpu.data.shards import write_shards

    if os.path.exists(os.path.join(shard_dir, "index.json")):
        return

    class _Synthetic:
        def __len__(self):
            return n

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            image = rng.randint(0, 256, (hw, hw, 3)).astype(np.float32)
            label = rng.randint(0, num_class, (hw, hw)).astype(np.int32)
            return image, label

    print(f"writing {n} {hw}^2 samples to {shard_dir} ...", flush=True)
    write_shards(_Synthetic(), shard_dir, store_size=(hw, hw),
                 samples_per_shard=64)


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/iseg_tpu_xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import create_train_state, make_train_step
    from iseg_tpu.data.device_augment import (
        DeviceAugmentConfig,
        make_device_augment,
    )
    from iseg_tpu.data.loader import device_prefetch
    from iseg_tpu.data.shards import ShardReader, shard_batches
    from iseg_tpu.nn.heads import ASPP
    from iseg_tpu.parallel.mesh import create_mesh, shard_batch

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        batch, hw, steps, warmup, reps = 16, 512, 20, 5, 5
        dtype = jnp.bfloat16
        n_samples, num_class = 512, 21
    else:
        batch, hw, steps, warmup, reps = 2, 128, 3, 1, 2
        dtype = jnp.float32
        n_samples, num_class = 16, 21

    shard_dir = os.path.join(tempfile.gettempdir(), f"iseg_shards_{hw}")
    ensure_shards(shard_dir, n_samples, hw, num_class)
    reader = ShardReader(shard_dir)

    mesh = create_mesh(model_parallelism=1)
    model = SegManaged(
        num_class=num_class,
        backbone=get_backbone("resnet50", output_stride=16, dtype=dtype),
        head=ASPP(filters=256, dtype=dtype),
        upsample_logits=False,
        fuse_upsample_loss=True,
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, hw, hw, 3), dtype))
    tx, _ = get_optimizer(
        variables["params"], "sgd", learning_rate=0.01, train_steps=1000
    )
    state = create_train_state(model, rng, (batch, hw, hw, 3), tx,
                               input_dtype=dtype)
    step_fn = make_train_step(model.build_loss_fn())

    aug = make_device_augment(DeviceAugmentConfig(
        crop_size=(hw, hw), min_scale_factor=0.5, max_scale_factor=2.0,
        flip_prob=0.5, ignore_label=255,
    ))

    @jax.jit
    def augment_and_norm(key, images_u8, labels_u8):
        images, labels = aug(key, images_u8, labels_u8.astype(jnp.int32))
        # zero-mean [-1, 1] input norm (reference input_norm.py:7)
        images = (images.astype(dtype) - 127.5) / 127.5
        return images, labels

    mode = os.environ.get("BENCH_MODE", "")
    resident = mode in ("resident", "resident_fused")
    fused_step = mode == "resident_fused"
    if resident:
        from iseg_tpu.data.resident import DeviceResidentDataset

        t0 = time.perf_counter()
        ds = DeviceResidentDataset(reader)
        jax.block_until_ready(ds.images)
        print(f"# resident upload: {ds.nbytes() / 1e6:.0f} MB in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

        def batches_forever():
            epoch = 0
            while True:
                yield from ds.batches(batch, epoch=epoch, seed=0)
                epoch += 1
    else:
        def batches_forever():
            epoch = 0
            while True:
                yield from shard_batches(reader, batch, shuffle=True, seed=0,
                                         epoch=epoch)
                epoch += 1

    if fused_step:
        from iseg_tpu.core.train import make_resident_train_step

        def augment_and_norm_raw(key, images_u8, labels_i32):
            images, labels = aug(key, images_u8, labels_i32)
            images = (images.astype(dtype) - 127.5) / 127.5
            return images, labels

        res_step = make_resident_train_step(
            model.build_loss_fn(), ds.images, ds.labels,
            augment_fn=augment_and_norm_raw)

        def index_forever():
            epoch = 0
            while True:
                yield from ds.index_batches(batch, epoch=epoch, seed=0)
                epoch += 1

        idx_it = iter(index_forever())

        def run_steps(n_steps, state):
            for _ in range(n_steps):
                state, parts = res_step(state, next(idx_it), rng)
            return state, parts
    else:
        it = (iter(batches_forever()) if resident else device_prefetch(
            batches_forever(), lambda b: shard_batch(mesh, b), size=2
        ))

        def run_steps(n_steps, state):
            host_step = 0
            for _ in range(n_steps):
                b = next(it)
                key = jax.random.fold_in(rng, host_step)
                host_step += 1
                image, label = augment_and_norm(key, b["image"], b["label"])
                state, parts = step_fn(state,
                                       {"image": image, "label": label},
                                       rng)
            return state, parts

    # warmup: compile + fill page cache (first epoch reads cold from disk)
    state, parts = run_steps(warmup, state)
    _ = float(parts["loss"])

    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, parts = run_steps(steps, state)
        loss = float(parts["loss"])
        dt = time.perf_counter() - t0
        assert loss == loss
        rates.append(batch * steps / dt / jax.device_count())
    rates.sort()
    metric = ("resnet50_aspp_512_train_from_disk_resident_fused"
              if fused_step else
              "resnet50_aspp_512_train_from_disk_resident" if resident
              else "resnet50_aspp_512_train_from_disk_shards")
    print(json.dumps({
        "metric": metric,
        "value": round(rates[len(rates) // 2], 2),
        "unit": "images/sec/chip",
        "reps": reps,
        "min": round(rates[0], 2),
        "max": round(rates[-1], 2),
    }))


if __name__ == "__main__":
    main()
