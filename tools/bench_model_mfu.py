"""Per-model train-step MFU/roofline rows (VERDICT round-1 weak #3).

Times the full train step (fwd + bwd + update) for each model config and
reports MFU = XLA-counted FLOPs / time / peak. FLOPs come from the compiled
executable's own cost analysis (``compiled.cost_analysis()['flops']``) —
the compiler's count of what it actually scheduled, not a hand model.

Usage (TPU): python tools/bench_model_mfu.py [swin|intern|resnet ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = 197e12  # TPU v5e bf16


def build(config_name: str):
    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.nn.heads import ASPP, JPU, SemanticFPN

    dtype = jnp.bfloat16
    if config_name == "resnet":
        model = SegManaged(
            num_class=21,
            backbone=get_backbone("resnet50", output_stride=16, dtype=dtype),
            head=ASPP(filters=256, dtype=dtype),
            upsample_logits=False, fuse_upsample_loss=True,
        )
        batch, hw, nc = 16, 512, 21
    elif config_name == "swin":
        model = SegManaged(
            num_class=19,
            backbone=get_backbone("swin_large", dtype=dtype),
            head=SemanticFPN(filters=256, dtype=dtype),
            upsample_logits=False, fuse_upsample_loss=True,
        )
        batch, hw, nc = 8, 512, 19
    elif config_name == "intern":
        model = SegManaged(
            num_class=19,
            # remat: the grouped dense-local displacement loop's bwd
            # residuals (49 x t[B,H,W,G*KK] f32 per layer) exceed HBM at
            # b8 512^2 without it (round-5 probe notes)
            backbone=get_backbone("intern_image_tiny", dtype=dtype,
                                  dcn_sampling="auto", remat=True),
            head=ASPP(filters=256, dtype=dtype),
            upsample_logits=False, fuse_upsample_loss=True,
        )
        batch, hw, nc = 8, 512, 19
    elif config_name == "hrnet":
        # BASELINE config #3 training geometry (Cityscapes crops)
        model = SegManaged(
            num_class=19,
            backbone=get_backbone("hrnet_w48", dtype=dtype),
            head=JPU(filters=512, dtype=dtype),
            upsample_logits=False, fuse_upsample_loss=True,
        )
        batch, hw, nc = 8, 512, 19
    elif config_name == "eva":
        # BASELINE config #5: EVA02-L, ADE20K classes
        model = SegManaged(
            num_class=150,
            backbone=get_backbone("eva02_large_patch16_512_coco",
                                  dtype=dtype),
            head=ASPP(filters=256, dtype=dtype),
            upsample_logits=False, fuse_upsample_loss=True,
        )
        batch, hw, nc = 4, 512, 150
    else:
        raise SystemExit(f"unknown config {config_name}")
    return model, batch, hw, nc


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iseg_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import create_train_state, make_train_step

    configs = sys.argv[1:] or ["resnet", "swin", "intern"]
    for name in configs:
        model, batch, hw, nc = build(name)
        dtype = jnp.bfloat16
        rng = jax.random.PRNGKey(0)
        variables = model.init(rng, jnp.zeros((1, hw, hw, 3), dtype))
        tx, _ = get_optimizer(variables["params"], "sgd",
                              learning_rate=0.01, train_steps=1000)
        state = create_train_state(model, rng, (batch, hw, hw, 3), tx,
                                   input_dtype=dtype)
        step_fn = make_train_step(model.build_loss_fn())

        x = np.random.RandomState(0).rand(batch, hw, hw, 3).astype(np.float32)
        y = np.random.RandomState(1).randint(0, nc, (batch, hw, hw))
        data = {"image": jnp.asarray(x, dtype),
                "label": jnp.asarray(y, jnp.int32)}

        lowered = jax.jit(step_fn, donate_argnums=(0,)).lower(state, data, rng)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", float("nan")))

        steps, warm = 10, 3
        for _ in range(warm):
            state, parts = step_fn(state, data, rng)
        _ = float(parts["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, parts = step_fn(state, data, rng)
        _ = float(parts["loss"])
        dt = (time.perf_counter() - t0) / steps

        mfu = flops / dt / PEAK_FLOPS * 100
        print(json.dumps({
            "config": name, "ms_per_step": round(dt * 1e3, 1),
            "img_per_sec": round(batch / dt, 1),
            "xla_gflops_per_step": round(flops / 1e9, 1),
            "mfu_pct": round(mfu, 1),
        }))


if __name__ == "__main__":
    main()
