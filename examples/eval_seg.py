"""Evaluation driver: restore a checkpoint (or ingest a full-model .h5)
and compute mIoU over a labeled directory dataset with the full inference
engine (multi-scale + flip, sliding window, shape bucketing).

The eval half of the REPRO.md runbook (reference:
``evaluations/evaluation.py:19`` custom loop driving
``inference_with_multi_scales`` / ``inference_with_sliding_window``).

Examples:
  # VOC val, multi-scale + flip
  python examples/eval_seg.py --data_dir /data/voc_val --num_class 21 \
      --backbone resnet50 --head aspp --ckpt_dir /tmp/iseg_tpu_ckpt \
      --scales 0.5,0.75,1.0,1.25,1.5,1.75 --flip --bucket 32

  # Cityscapes val, sliding window at 1024^2 crops
  python examples/eval_seg.py --data_dir /data/cityscapes_val \
      --num_class 19 --backbone hrnet_w48 --head jpu \
      --ckpt_dir /tmp/ckpt_hrnet --sliding 1024
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True,
                   help="dir with images/ and labels/ subdirs")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--backbone_kwargs", default="{}")
    p.add_argument("--head", default="aspp",
                   choices=["simpledecoder", "aspp", "fpn", "jpu", "fapn",
                            "nasfpn"])
    p.add_argument("--output_stride", type=int, default=16)
    p.add_argument("--num_class", type=int, default=21)
    p.add_argument("--ignore_label", type=int, default=255)
    p.add_argument("--ckpt_dir", default=None,
                   help="orbax checkpoint dir written by train_seg.py")
    p.add_argument("--weights_h5", default=None,
                   help="full-model flat .h5 (core.h5_ingest."
                        "save_h5_weights round-trip format)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--scales", default="1.0")
    p.add_argument("--flip", action="store_true")
    p.add_argument("--sliding", type=int, default=None,
                   help="sliding-window crop size (e.g. 512)")
    p.add_argument("--bucket", type=int, default=None,
                   help="pad eval shapes to multiples (compile O(#buckets) "
                        "programs for variable-size val sets)")
    p.add_argument("--cpu", action="store_true")
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
    from iseg_tpu.data import StandardAugmentationsPipeline
    from iseg_tpu.data.loader import SegDirectoryDataset, batched_dataset
    from iseg_tpu.nn import heads

    # eval batches are small (often 1 for native-size multi-scale); cap
    # the data axis at the largest device count that divides the batch
    n_dev = len(jax.devices())
    use_dev = next(d for d in range(min(args.batch, n_dev), 0, -1)
                   if args.batch % d == 0)
    env = common_env_setup(EnvConfig(random_seed=0, num_devices=use_dev))

    head = {
        "simpledecoder": lambda: heads.SimpleDecoder(dtype=env.compute_dtype),
        "aspp": lambda: heads.ASPP(dtype=env.compute_dtype),
        "fpn": lambda: heads.SemanticFPN(dtype=env.compute_dtype),
        "jpu": lambda: heads.JPU(dtype=env.compute_dtype),
        "fapn": lambda: heads.FAPN(dtype=env.compute_dtype),
        "nasfpn": lambda: heads.NASFPN(dtype=env.compute_dtype),
    }[args.head]()
    model = SegManaged(
        num_class=args.num_class,
        ignore_label=args.ignore_label,
        backbone=get_backbone(args.backbone,
                              output_stride=args.output_stride,
                              dtype=env.compute_dtype,
                              **json.loads(args.backbone_kwargs)),
        head=head,
        dtype=env.compute_dtype,
    )

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    if args.ckpt_dir:
        helper = ModelHelper(args.ckpt_dir)
        restored = helper.restore_latest_variables(variables)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
        variables = restored
        print(f"restored step {helper.all_steps()[-1]} from {args.ckpt_dir}")
    elif args.weights_h5:
        from iseg_tpu.core.h5_ingest import load_h5_weights_by_name

        variables, report = load_h5_weights_by_name(
            variables, args.weights_h5)
        print(f"ingested {len(report['loaded'])} weights, "
              f"{len(report['missing'])} unmatched")
        if report["missing"]:
            raise SystemExit(f"unmatched: {report['missing'][:6]}")
    else:
        raise SystemExit("pass --ckpt_dir or --weights_h5")

    config = SegModelInferenceConfig(
        scale_rates=tuple(float(s) for s in args.scales.split(",")),
        flip=args.flip,
        sliding_window_crop_size=((args.sliding, args.sliding)
                                  if args.sliding else None),
        bucket_multiple=args.bucket,
    )

    ds = SegDirectoryDataset(os.path.join(args.data_dir, "images"),
                             os.path.join(args.data_dir, "labels"))
    # native-size eval (crop_size=None disables the eval pad); shape
    # variety is handled by bucket_multiple / the sliding window
    pipe = StandardAugmentationsPipeline(training=False, crop_size=None)

    def batches():
        return batched_dataset(ds, args.batch, pipeline=pipe,
                               drop_remainder=False)

    miou, per_class = evaluate(env, model, variables, batches(),
                               num_class=args.num_class,
                               ignore_label=args.ignore_label,
                               inference_config=config)
    print(json.dumps({
        "miou": round(float(miou), 5),
        "per_class_iou": [round(float(v), 5) for v in per_class],
        "images": len(ds),
        "config": {"scales": args.scales, "flip": args.flip,
                   "sliding": args.sliding, "bucket": args.bucket},
    }))


if __name__ == "__main__":
    main()
