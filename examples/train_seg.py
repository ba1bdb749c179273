"""End-to-end segmentation training driver.

Covers BASELINE configs #1/#2: choose backbone/head/crop via flags. With
--data_dir pointing at (images/, labels/) directories it trains on real
data; without it, a synthetic shapes dataset is generated so the full
pipeline is runnable anywhere (CPU mesh or TPU).

Examples:
  python examples/train_seg.py --backbone mobilenetv2 --head simpledecoder \
      --crop 512 --batch 8 --epochs 3
  python examples/train_seg.py --backbone resnet50 --head aspp --ohem \
      --data_dir /data/voc --num_class 21
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthetic_dataset(num_samples, crop, num_class, seed=0):
    """Blob dataset: class k = a bright square of intensity band k."""
    def make(i):
        rng = np.random.RandomState(seed * 100003 + i)
        img = np.full((crop + 32, crop + 32, 3), 127.5, np.float32)
        img += rng.randn(*img.shape) * 4
        lab = np.zeros(img.shape[:2], np.int32)
        for k in range(1, num_class):
            y, x = rng.randint(0, crop, 2)
            s = rng.randint(12, 40)
            img[y : y + s, x : x + s] = 40 + (215 * k) // num_class
            lab[y : y + s, x : x + s] = k
        return img, lab

    return make


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="mobilenetv2")
    p.add_argument("--backbone_kwargs", default="{}",
                   help='JSON kwargs for get_backbone, e.g. '
                        '\'{"dcn_sampling": "dense_local", "remat": true}\'')
    p.add_argument("--head", default="simpledecoder",
                   choices=["simpledecoder", "aspp", "fpn", "jpu", "fapn", "nasfpn"])
    p.add_argument("--output_stride", type=int, default=16)
    p.add_argument("--crop", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--steps_per_epoch", type=int, default=50)
    p.add_argument("--num_class", type=int, default=21)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--optimizer", default="sgd")
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--ohem", action="store_true")
    p.add_argument("--fused_loss", action="store_true",
                   help="use the Pallas fused upsample+CE kernel")
    p.add_argument("--data_dir", default=None,
                   help="dir with images/ and labels/ subdirs; synthetic if unset")
    p.add_argument("--pretrained", default=None,
                   help="published backbone weight file (.h5/.weights.h5/"
                        ".keras/TF-ckpt) ingested by name map, e.g. the "
                        "reference's resnet50.h5 release")
    p.add_argument("--ckpt_dir", default="/tmp/iseg_tpu_ckpt")
    p.add_argument("--eval_scales", default="1.0")
    p.add_argument("--flip_eval", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force the 8-device CPU mesh")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax
    import jax.numpy as jnp

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.checkpoint import ModelHelper
    from iseg_tpu.core.env import EnvConfig, common_env_setup
    from iseg_tpu.core.evaluation import evaluate
    from iseg_tpu.core.model import SegManaged, SegModelInferenceConfig
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import CoreTrain
    from iseg_tpu.data import StandardAugmentationsPipeline
    from iseg_tpu.nn import heads

    env = common_env_setup(EnvConfig(random_seed=0))
    print(f"mesh: {env.mesh.shape} compute={env.compute_dtype.__name__}")

    head = {
        "simpledecoder": lambda: heads.SimpleDecoder(dtype=env.compute_dtype),
        "aspp": lambda: heads.ASPP(dtype=env.compute_dtype),
        "fpn": lambda: heads.SemanticFPN(dtype=env.compute_dtype),
        "jpu": lambda: heads.JPU(dtype=env.compute_dtype),
        "fapn": lambda: heads.FAPN(dtype=env.compute_dtype),
        "nasfpn": lambda: heads.NASFPN(dtype=env.compute_dtype),
    }[args.head]()

    import json

    model = SegManaged(
        num_class=args.num_class,
        backbone=get_backbone(args.backbone, output_stride=args.output_stride,
                              dtype=env.compute_dtype,
                              **json.loads(args.backbone_kwargs)),
        head=head,
        use_ohem=args.ohem,
        upsample_logits=not args.fused_loss,
        fuse_upsample_loss=args.fused_loss,
        dtype=env.compute_dtype,
    )

    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, args.crop, args.crop, 3)))
    if args.pretrained:
        # published-backbone ingest by name map (REPRO.md): the SegManaged
        # tree keeps backbone params under the "backbone" segment the
        # family maps address; head/logits stay at their fresh init
        from iseg_tpu.backbones.pretrained import name_map_for
        from iseg_tpu.core.h5_ingest import load_h5_weights_by_name

        map_fn = name_map_for(args.backbone)
        mapping = map_fn(variables) if map_fn is not None else None
        variables, report = load_h5_weights_by_name(
            variables, args.pretrained, name_map=mapping)
        backbone_missing = [m for m in report["missing"]
                            if "/backbone/" in m]
        print(f"pretrained ingest: {len(report['loaded'])} loaded, "
              f"{len(backbone_missing)} backbone params unmatched")
        if backbone_missing:
            raise SystemExit(
                f"unmatched backbone params, refusing to silently train "
                f"from partial init: {backbone_missing[:6]}")
    tx, _ = get_optimizer(
        variables["params"], args.optimizer, learning_rate=args.lr,
        train_steps=args.epochs * args.steps_per_epoch,
        warmup_steps=args.steps_per_epoch // 2,
        weight_decay=args.weight_decay,
    )

    train_pipe = StandardAugmentationsPipeline(
        training=True, crop_size=(args.crop, args.crop))
    eval_pipe = StandardAugmentationsPipeline(
        training=False, crop_size=(args.crop, args.crop))

    if args.data_dir:
        from iseg_tpu.data.loader import SegDirectoryDataset, batched_dataset

        train_ds = SegDirectoryDataset(
            os.path.join(args.data_dir, "images"),
            os.path.join(args.data_dir, "labels"))

        def dataset_fn(epoch):
            return batched_dataset(train_ds, args.batch, pipeline=train_pipe,
                                   shuffle=True, epoch=epoch)

        def eval_fn():
            return batched_dataset(train_ds, args.batch, pipeline=eval_pipe)
    else:
        make = synthetic_dataset(1000, args.crop, args.num_class)

        def dataset_fn(epoch):
            for s in range(args.steps_per_epoch):
                pairs = [
                    train_pipe(*make(epoch * 10000 + s * args.batch + k),
                               sample_index=s * args.batch + k)
                    for k in range(args.batch)
                ]
                yield {"image": np.stack([p[0] for p in pairs]),
                       "label": np.stack([p[1] for p in pairs])}

        def eval_fn():
            for s in range(8):
                pairs = [eval_pipe(*make(990000 + s * args.batch + k))
                         for k in range(args.batch)]
                yield {"image": np.stack([p[0] for p in pairs]),
                       "label": np.stack([p[1] for p in pairs])}

    trainer = CoreTrain(
        env, model, tx, input_shape=(1, args.crop, args.crop, 3),
        checkpoint_manager=ModelHelper(args.ckpt_dir, max_to_keep=2),
        log_every=10,
        variables=variables,  # skip a second full init inside CoreTrain
    )
    resumed = trainer.restore()
    trainer.train(dataset_fn, epochs=args.epochs,
                  steps_per_epoch=args.steps_per_epoch,
                  # exact-step resume: derive the epoch (and the already-
                  # consumed prefix of it) from the restored step count —
                  # initial_epoch=0 after a restore would replay epoch-0
                  # data against an already-spent LR schedule
                  initial_epoch=-1 if resumed else 0)

    miou, per_class = evaluate(
        env, model,
        {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats},
        eval_fn(),
        inference_config=SegModelInferenceConfig(
            scale_rates=tuple(float(s) for s in args.eval_scales.split(",")),
            flip=args.flip_eval,
        ),
        verbose=False,
    )
    print(f"final mIoU: {miou:.4f}")
    print("per-class IoU:", np.round(per_class, 4).tolist())


if __name__ == "__main__":
    main()
