"""Measure DCNv3 effective-offset distributions before/after training
(VERDICT round-1 #4: do trained offsets stay inside the dense-local clamp?).

Trains a small InternImage + SimpleDecoder on the synthetic shapes task and
prints each DCN layer's max effective-offset magnitude at init and after
training, plus the per-layer recommendation from calibrate_dcn_sampling.

Run: python tools/measure_dcn_offsets.py [steps]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU by default (set BEFORE any backend use — jax is pre-imported pinned
# to the TPU tunnel in this image; pass --tpu to run there instead)
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def synthetic_batch(rs, batch, hw, num_class):
    """Shapes-style task: label = which quadrant-ish blob a pixel is in."""
    imgs = np.zeros((batch, hw, hw, 3), np.float32)
    labels = np.zeros((batch, hw, hw), np.int32)
    for b in range(batch):
        for _ in range(3):
            cls = rs.randint(1, num_class)
            cy, cx = rs.randint(4, hw - 4, 2)
            r = rs.randint(3, max(4, hw // 4))
            yy, xx = np.mgrid[:hw, :hw]
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            labels[b][m] = cls
            imgs[b][m] = np.array([cls / num_class, 1 - cls / num_class,
                                   0.5]) + rs.randn(3) * 0.05
        imgs[b] += rs.randn(hw, hw, 3) * 0.05
    return imgs, labels


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    from iseg_tpu.backbones.intern_image import InternImage
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import create_train_state, make_train_step
    from iseg_tpu.nn.dcn import calibrate_dcn_sampling
    from iseg_tpu.nn.heads import SimpleDecoder

    num_class, hw, batch = 4, 64, 4
    backbone = InternImage(channels=32, depths=(2, 2), groups=(2, 4),
                           dcn_sampling="auto")
    model = SegManaged(num_class=num_class, backbone=backbone,
                       head=SimpleDecoder(filters=32))

    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, hw, hw, 3)))
    tx, _ = get_optimizer(variables["params"], "adamw", learning_rate=3e-3,
                          train_steps=steps, warmup_steps=10)
    state = create_train_state(model, rng, (batch, hw, hw, 3), tx)
    step_fn = make_train_step(model.build_loss_fn())

    def calibrate(params, batch_stats, tag):
        v = {"params": params, "batch_stats": batch_stats}
        x = jnp.asarray(synthetic_batch(np.random.RandomState(99), 2, hw,
                                        num_class)[0])
        rep = calibrate_dcn_sampling(model, v, x)
        mags = {k.split("InternImageBlock_")[-1][:40]: round(
            s["max_offset_mag"], 3) for k, s in rep.items()}
        rs = {k: s["recommended_r"] for k, s in rep.items()}
        print(json.dumps({"tag": tag, "max_mag": round(
            max(s["max_offset_mag"] for s in rep.values()), 3),
            "per_layer_mag": mags,
            "max_recommended_r": max(rs.values())}))
        return rep

    calibrate(state.params, state.batch_stats, "init")

    rs = np.random.RandomState(0)
    loss = None
    for i in range(steps):
        imgs, labels = synthetic_batch(rs, batch, hw, num_class)
        state, parts = step_fn(
            state, {"image": jnp.asarray(imgs), "label": jnp.asarray(labels)},
            rng)
        if i % 40 == 0 or i == steps - 1:
            loss = float(parts["loss"])
            print(f"step {i} loss {loss:.3f}")
    rep = calibrate(state.params, state.batch_stats, f"after_{steps}_steps")

    worst = max(s["max_offset_mag"] for s in rep.values())
    print(json.dumps({
        "conclusion": "trained offsets exceed default clamp r=2"
        if worst > 2 else "trained offsets stay inside default clamp r=2",
        "worst_mag": round(worst, 3),
        "exact_with_r": int(np.ceil(worst)),
    }))


if __name__ == "__main__":
    main()
