"""Determinism: the reference's headline claim is bit-exact reruns
(README.md:64, SURVEY §4). Two identically-seeded runs of the full
pipeline (augment -> train -> eval logits) must agree exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones import get_backbone
from iseg_tpu.core.env import EnvConfig, common_env_setup
from iseg_tpu.core.model import SegManaged
from iseg_tpu.core.optimizer import get_optimizer
from iseg_tpu.core.train import create_train_state, make_train_step
from iseg_tpu.data import StandardAugmentationsPipeline
from iseg_tpu.nn.heads import SimpleDecoder


def _run_once():
    env = common_env_setup(EnvConfig(mixed_precision=False, random_seed=7))
    model = SegManaged(
        num_class=3,
        backbone=get_backbone("mobilenetv2", output_stride=16, width_multiplier=0.35),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    rng = jax.random.PRNGKey(env.seed)
    variables = model.init(rng, jnp.zeros((1, 32, 32, 3)))
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.05,
                          train_steps=10, decay_strategy="none")
    state = create_train_state(model, rng, (1, 32, 32, 3), tx)
    step = make_train_step(model.build_loss_fn(), donate=False)

    pipe = StandardAugmentationsPipeline(training=True, crop_size=(32, 32), seed=3)
    src = np.random.RandomState(0).rand(40, 48, 3).astype(np.float32) * 255
    lab = np.random.RandomState(1).randint(0, 3, (40, 48)).astype(np.int32)

    for i in range(4):
        imgs, labs = zip(*[pipe(src, lab, sample_index=i * 4 + k) for k in range(4)])
        batch = {"image": jnp.asarray(np.stack(imgs)),
                 "label": jnp.asarray(np.stack(labs))}
        state, parts = step(state, batch, rng)

    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(np.stack(imgs)), train=False)
    return float(parts["loss"]), np.asarray(logits)


def test_bit_exact_rerun():
    loss1, logits1 = _run_once()
    loss2, logits2 = _run_once()
    assert loss1 == loss2
    np.testing.assert_array_equal(logits1, logits2)
