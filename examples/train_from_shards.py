"""Train from pre-decoded shards — the chip-rate disk input path.

Workflow (BENCH_NOTES round 3: resident path measured within 5% of the
synthetic-input ceiling):

  1. ``--prepare``: decode an (images/, labels/) directory ONCE into
     fixed-shape uint8 npy shards (``iseg_tpu.data.shards.write_shards``);
     without ``--data_dir`` a synthetic dataset is generated so this runs
     anywhere.
  2. train with either input mode:
     - ``--mode resident`` (default): upload the shards to device memory
       once; every batch is an on-device gather + fused augment — zero
       host->HBM traffic per step. Use when the dataset fits HBM
       (VOC-512^2 u8 is ~8.4 GB vs 16 GB/chip).
     - ``--mode stream``: memmap gather on host + device prefetch — for
       datasets larger than HBM.

Examples:
  python examples/train_from_shards.py --prepare --shard_dir /tmp/shards
  python examples/train_from_shards.py --shard_dir /tmp/shards --epochs 3
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class _SyntheticDataset:
    """Blob dataset (same recipe as train_seg.py) for the no-data case."""

    def __init__(self, n, size, num_class):
        self.n, self.size, self.num_class = n, size, num_class

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(100003 + i)
        s = self.size
        img = np.full((s, s, 3), 127.5, np.float32)
        lab = np.zeros((s, s), np.int32)
        k = rng.randint(1, self.num_class)
        y, x = rng.randint(0, s // 2, 2)
        h, w = rng.randint(s // 4, s // 2, 2)
        img[y:y + h, x:x + w] = 60.0 + 40.0 * k
        lab[y:y + h, x:x + w] = k
        return img, lab


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prepare", action="store_true",
                   help="write shards then exit")
    p.add_argument("--data_dir", default=None,
                   help="directory with images/ and labels/ (else synthetic)")
    p.add_argument("--shard_dir", default="/tmp/iseg_shards_example")
    p.add_argument("--mode", choices=("resident", "stream"),
                   default="resident")
    p.add_argument("--store_size", type=int, default=128)
    p.add_argument("--crop", type=int, default=96)
    p.add_argument("--num_class", type=int, default=4)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--steps_per_epoch", type=int, default=20)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--log_dir", default=None,
                   help="TensorBoard/CSV scalar log directory")
    args = p.parse_args()

    from iseg_tpu.data.shards import ShardReader, write_shards

    if args.prepare or not os.path.exists(
            os.path.join(args.shard_dir, "index.json")):
        if args.data_dir:
            from iseg_tpu.data.loader import SegDirectoryDataset

            dataset = SegDirectoryDataset(
                os.path.join(args.data_dir, "images"),
                os.path.join(args.data_dir, "labels"))
        else:
            dataset = _SyntheticDataset(64, args.store_size, args.num_class)
        index = write_shards(dataset, args.shard_dir,
                             store_size=(args.store_size, args.store_size))
        print(f"wrote {index['num_samples']} samples, "
              f"{len(index['shards'])} shards -> {args.shard_dir}")
        if args.prepare:
            return

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
    from iseg_tpu.nn import norm
    from iseg_tpu.nn.heads import SimpleDecoder

    norm.set_bn_momentum(0.9)  # short-run stat settling (verify skill note)
    env = common_env_setup(EnvConfig())
    model = SegManaged(
        num_class=args.num_class,
        backbone=get_backbone("resnet9", output_stride=16),
        head=SimpleDecoder(filters=32, low_level_filters=16),
    )
    shape = (1, args.crop, args.crop, 3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(shape))
    train_steps = args.epochs * args.steps_per_epoch
    tx, schedule = get_optimizer(variables["params"], "sgd",
                                 learning_rate=args.lr,
                                 train_steps=train_steps, warmup_steps=5)
    augment = make_device_augment(DeviceAugmentConfig(
        crop_size=(args.crop, args.crop), ignore_label=255))

    trainer = CoreTrain(
        env, model, tx, input_shape=shape, device_augment=augment,
        log_every=10, log_dir=args.log_dir, lr_schedule=schedule,
    )

    if args.mode == "resident":
        from iseg_tpu.data.resident import DeviceResidentDataset

        ds = DeviceResidentDataset(ShardReader(args.shard_dir))
        print(f"resident: {ds.num_samples} samples, "
              f"{ds.nbytes() / 1e6:.1f} MB in device memory")
        dataset_fn = ds.dataset_fn(batch_size=args.batch)
    else:
        from iseg_tpu.data.shards import make_shard_dataset_fn

        dataset_fn = make_shard_dataset_fn(args.shard_dir,
                                           batch_size=args.batch)

    history = trainer.train(dataset_fn, epochs=args.epochs,
                            steps_per_epoch=args.steps_per_epoch)
    print(f"final loss: {history[-1]['loss']:.4f}")


if __name__ == "__main__":
    main()
