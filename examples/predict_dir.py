"""Predict every image in a directory to label PNGs
(reference workflow: ``core_predict.predict_with_dir``).

  python examples/predict_dir.py --input_dir imgs/ --output_dir preds/ \
      --backbone resnet50 --head aspp --ckpt_dir /tmp/iseg_tpu_ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--head", default="aspp")
    p.add_argument("--num_class", type=int, default=21)
    p.add_argument("--output_stride", type=int, default=16)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--scales", default="1.0")
    p.add_argument("--flip", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.checkpoint import ModelHelper
    from iseg_tpu.core.env import EnvConfig, common_env_setup
    from iseg_tpu.core.model import SegManaged, SegModelInferenceConfig
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.predict import predict_with_dir
    from iseg_tpu.core.train import create_train_state
    from iseg_tpu.nn import heads

    env = common_env_setup(EnvConfig())
    head = {"aspp": heads.ASPP, "simpledecoder": heads.SimpleDecoder}[args.head](
        dtype=env.compute_dtype)
    model = SegManaged(
        num_class=args.num_class,
        backbone=get_backbone(args.backbone, output_stride=args.output_stride,
                              dtype=env.compute_dtype),
        head=head, dtype=env.compute_dtype,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)))

    if args.ckpt_dir:
        tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.0)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, 512, 512, 3), tx)
        restored = ModelHelper(args.ckpt_dir).restore_latest(state)
        if restored is None:
            # silently predicting from random init writes garbage PNGs
            raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
        variables = {"params": restored.params,
                     "batch_stats": restored.batch_stats}
        print(f"restored checkpoint at step {int(restored.step)}")

    written = predict_with_dir(
        model, variables, args.input_dir, args.output_dir,
        batch_size=args.batch,
        inference_config=SegModelInferenceConfig(
            scale_rates=tuple(float(s) for s in args.scales.split(",")),
            flip=args.flip,
        ),
    )
    print(f"wrote {len(written)} predictions to {args.output_dir}")


if __name__ == "__main__":
    main()
