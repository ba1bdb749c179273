"""Batch-size sweep for the headline train config.

The headline (BASELINE config #2, ResNet-50+ASPP 512^2) has always run at
batch 16 — an inherited choice, not a measured optimum. img/s/chip is
batch-free as a metric, so if a larger per-chip batch amortizes
BN/elementwise/update overhead into the MXU work (or a smaller one
relieves HBM pressure), the headline should move to it. This sweeps the
batch axis and reports throughput + step time per setting; OOM settings
report as "oom" instead of crashing the sweep.

Usage (TPU): python tools/bench_batch_sweep.py [8 16 24 32]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # CPU smoke mode: SWEEP_PLATFORM=cpu forces the CPU backend BEFORE any
    # device probe (the site pre-import pins JAX_PLATFORMS to the remote
    # TPU platform, so the env var alone cannot override it, and probing
    # devices on the default platform blocks when the hardware link is
    # stuck — see bench._init_devices_or_die)
    if os.environ.get("SWEEP_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import _init_devices_or_die
        _init_devices_or_die()  # bounded probe: a stuck link exits(3)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iseg_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import create_train_state, make_train_step
    from iseg_tpu.nn.heads import ASPP

    args = sys.argv[1:]
    batches = [int(a) for a in args if a.isdigit()] or [8, 16, 24, 32]
    hw, nc = (512, 21) if jax.devices()[0].platform == "tpu" else (64, 5)
    dtype = (jnp.bfloat16 if jax.devices()[0].platform == "tpu"
             else jnp.float32)

    model = SegManaged(
        num_class=nc,
        backbone=get_backbone("resnet50", output_stride=16, dtype=dtype),
        head=ASPP(filters=256, dtype=dtype),
        upsample_logits=False, fuse_upsample_loss=True,
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, hw, hw, 3), dtype))

    def run_one(batch):
        # a function scope so state/data die on return (frees HBM before
        # the next batch size allocates); construction is INSIDE the OOM
        # guard — model.init at batch 32 can RESOURCE_EXHAUST just as
        # easily as the first step
        tx, _ = get_optimizer(variables["params"], "sgd",
                              learning_rate=0.01, train_steps=1000)
        state = create_train_state(model, rng, (batch, hw, hw, 3), tx,
                                   input_dtype=dtype)
        step_fn = make_train_step(model.build_loss_fn())
        x = np.random.RandomState(0).rand(batch, hw, hw, 3).astype(np.float32)
        y = np.random.RandomState(1).randint(0, nc, (batch, hw, hw))
        data = {"image": jnp.asarray(x, dtype),
                "label": jnp.asarray(y, jnp.int32)}
        steps, warm = 10, 3
        for _ in range(warm):
            state, parts = step_fn(state, data, rng)
        _ = float(parts["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, parts = step_fn(state, data, rng)
        _ = float(parts["loss"])
        dt = (time.perf_counter() - t0) / steps
        return {
            "batch": batch,
            "ms_per_step": round(dt * 1e3, 1),
            "img_per_sec": round(batch / dt, 1),
        }

    for batch in batches:
        try:
            row = run_one(batch)
        except Exception as e:  # noqa: BLE001 — keep sweeping past OOMs
            msg = repr(e)
            kind = "oom" if "RESOURCE_EXHAUSTED" in msg or "Out of memory" \
                in msg else "error"
            row = {"batch": batch, kind: msg[:200]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
