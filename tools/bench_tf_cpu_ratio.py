"""Measured TF-baseline construction (VERDICT round-1 weak #2).

TF cannot reach the TPU in this environment (the tunnel is JAX-only), so a
TF-on-TPU baseline cannot be measured directly. This tool measures the next
best defensible thing: the SAME model geometry (ResNet-50 + ASPP, config
#2), SAME train-step semantics (fwd + CE loss + backward + SGD update),
both lowered through the SAME compiler backend (XLA:CPU) on the SAME host —

  * reference side: the reference's OWN ResNet-50 (`ref_compat` build) +
    its OWN AtrousSpatialPyramidPooling, under
    ``tf.function(jit_compile=True)``;
  * ours: SegManaged(resnet50 + ASPP) through ``make_train_step``.

The steps/s ratio (ours / TF) is the framework+graph efficiency ratio under
identical XLA; for a compute-dominated 512^2-class step this is the best
available estimate of the TPU ratio, i.e. the ``vs_baseline`` multiplier.
Stated caveats: XLA:CPU has no MXU/bf16 path, and TF-on-TPU infeed/layout
behavior can't be captured on CPU; the measured ratio is an estimate, not a
measured TF-on-TPU number (none exists — the reference publishes none).

Writes BASELINE_MEASURED.json {"cpu_xla_ratio": R, ...} which bench.py uses
for ``vs_baseline`` when present.

Usage: PYTHONPATH=. python tools/bench_tf_cpu_ratio.py [size] [batch] [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 2
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
NC = 21


def measure_tf():
    import numpy as np
    import tensorflow as tf

    import ref_compat

    tf.config.optimizer.set_jit(True)
    backbone = ref_compat.build_reference_backbone(
        "resnet50", SIZE, output_stride=16)
    from iseg.layers.aspp import AtrousSpatialPyramidPooling

    aspp = AtrousSpatialPyramidPooling(filters=256)
    head_conv = tf.keras.layers.Conv2D(NC, 1)

    x0 = tf.zeros((BATCH, SIZE, SIZE, 3))
    feats = backbone(x0, training=False)
    aspp_out = aspp(feats[-1], training=False)
    head_conv(aspp_out)

    tvars = (backbone.trainable_variables + aspp.trainable_variables
             + head_conv.trainable_variables)
    opt = tf.keras.optimizers.SGD(0.01)

    @tf.function(jit_compile=True)
    def step(images, labels):
        with tf.GradientTape() as tape:
            feats = backbone(images, training=True)
            logits = head_conv(aspp(feats[-1], training=True))
            logits = tf.image.resize(logits, (SIZE, SIZE))
            loss = tf.reduce_mean(
                tf.nn.sparse_softmax_cross_entropy_with_logits(
                    labels=labels, logits=logits))
        grads = tape.gradient(loss, tvars)
        opt.apply_gradients(zip(grads, tvars))
        return loss

    rs = np.random.RandomState(0)
    images = tf.constant(rs.rand(BATCH, SIZE, SIZE, 3).astype("float32"))
    labels = tf.constant(rs.randint(0, NC, (BATCH, SIZE, SIZE)).astype("int32"))
    step(images, labels)  # compile
    t0 = time.perf_counter()
    for _ in range(STEPS):
        loss = step(images, labels)
    _ = float(loss)
    dt = time.perf_counter() - t0
    return STEPS * BATCH / dt


def measure_ours():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import create_train_state, make_train_step
    from iseg_tpu.nn.heads import ASPP

    model = SegManaged(
        num_class=NC,
        backbone=get_backbone("resnet50", output_stride=16),
        head=ASPP(filters=256),
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, SIZE, SIZE, 3)))
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.01,
                          train_steps=100, decay_strategy="none")
    state = create_train_state(model, rng, (1, SIZE, SIZE, 3), tx)
    step = make_train_step(model.build_loss_fn(), donate=True)

    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.rand(BATCH, SIZE, SIZE, 3), jnp.float32),
        "label": jnp.asarray(rs.randint(0, NC, (BATCH, SIZE, SIZE)), jnp.int32),
    }
    state, parts = step(state, batch, rng)  # compile
    jax.block_until_ready(parts)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, parts = step(state, batch, rng)
    jax.block_until_ready(parts)
    dt = time.perf_counter() - t0
    return STEPS * BATCH / dt


def main():
    ours = measure_ours()
    print(f"ours (XLA:CPU): {ours:.3f} img/s", flush=True)
    tf_rate = measure_tf()
    print(f"reference TF (XLA:CPU): {tf_rate:.3f} img/s", flush=True)
    ratio = ours / tf_rate
    out = {
        "cpu_xla_ratio": ratio,
        "ours_img_per_s_cpu": ours,
        "tf_img_per_s_cpu": tf_rate,
        "size": SIZE,
        "batch": BATCH,
        "method": ("same-geometry ResNet50+ASPP train step, both through "
                   "XLA:CPU on the same host; see tools/bench_tf_cpu_ratio.py"),
    }
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
