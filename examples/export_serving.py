"""Export a trained segmentation model as a standalone serving artifact.

Builds a model, (optionally) restores a checkpoint, serializes the
inference function with weights baked in (jax.export / StableHLO), then
reloads the artifact WITHOUT any model code and serves a directory of
images — the TPU-native replacement for shipping Python + weights.

  python examples/export_serving.py --out model.jaxexport
  python examples/export_serving.py --serve model.jaxexport --input imgs/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="mobilenetv2")
    p.add_argument("--num_class", type=int, default=21)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--ckpt", default=None, help="checkpoint dir to restore")
    p.add_argument("--out", default=None, help="write artifact here")
    p.add_argument("--serve", default=None, help="load artifact and serve")
    p.add_argument("--input", default=None, help="image dir for --serve")
    p.add_argument("--output", default="label",
                   choices=["logits", "probs", "label"])
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (jax here may be pre-pinned "
                        "to an accelerator; must be set before first use)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    if args.serve:
        from iseg_tpu.core.export import load_exported

        serve = load_exported(args.serve)
        if args.input:
            from PIL import Image

            for name in sorted(os.listdir(args.input)):
                img = np.asarray(
                    Image.open(os.path.join(args.input, name))
                    .convert("RGB")
                    .resize((args.size, args.size)),
                    np.float32,
                ) / 127.5 - 1.0
                pred = serve(img[None])
                print(name, np.asarray(pred).shape)
        else:
            pred = serve(np.zeros((1, args.size, args.size, 3), np.float32))
            print("artifact OK, output shape:", np.asarray(pred).shape)
        return

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.export import export_inference
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.nn.heads import SimpleDecoder

    model = SegManaged(
        num_class=args.num_class,
        backbone=get_backbone(args.backbone, output_stride=16),
        head=SimpleDecoder(filters=256),
    )
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, args.size, args.size, 3)))
    if args.ckpt:
        from iseg_tpu.core.checkpoint import ModelHelper
        from iseg_tpu.core.optimizer import get_optimizer
        from iseg_tpu.core.train import create_train_state

        tx, _ = get_optimizer(variables["params"], "sgd",
                              learning_rate=0.0, train_steps=1)
        template = create_train_state(
            model, jax.random.PRNGKey(0), (1, args.size, args.size, 3), tx)
        state = ModelHelper(args.ckpt).restore_latest(template)
        if state is None:
            raise SystemExit(f"no checkpoint found in {args.ckpt}")
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    out = args.out or "model.jaxexport"
    blob = export_inference(model, variables, (args.size, args.size),
                            output=args.output, path=out)
    print(f"wrote {out} ({len(blob)/1e6:.1f} MB, output={args.output}, "
          f"batch-polymorphic)")


if __name__ == "__main__":
    main()
