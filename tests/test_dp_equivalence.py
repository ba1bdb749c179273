"""Data-parallel correctness: one train step on a batch sharded over the
8-device mesh must produce the same updated params as the same batch on one
device (GSPMD inserts the gradient/BN reductions; the math must not change)."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones import get_backbone
from iseg_tpu.core.env import EnvConfig, common_env_setup
from iseg_tpu.core.model import SegManaged
from iseg_tpu.core.optimizer import get_optimizer
from iseg_tpu.core.train import create_train_state, make_train_step
from iseg_tpu.nn.heads import SimpleDecoder
from iseg_tpu.parallel.mesh import shard_batch


def test_sharded_step_matches_single_device():
    env = common_env_setup(EnvConfig(mixed_precision=False))
    model = SegManaged(
        num_class=3,
        # include_top_conv=False: the 1280-wide top BN's backward amplifies
        # fp32 reduction-order noise past the tight tolerance on these tiny
        # 32x32 test features (it defaults True for reference parity)
        backbone=get_backbone("mobilenetv2", output_stride=16,
                              width_multiplier=0.35, include_top_conv=False),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    rng = jax.random.PRNGKey(0)

    def one_step(batch_arrays):
        variables = model.init(rng, jnp.zeros((1, 32, 32, 3)))
        tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.1,
                              train_steps=10, decay_strategy="none")
        state = create_train_state(model, rng, (1, 32, 32, 3), tx)
        step = make_train_step(model.build_loss_fn(), donate=False)
        state, parts = step(state, batch_arrays, rng)
        return state, float(parts["loss"])

    rs = np.random.RandomState(0)
    batch_np = {
        "image": rs.rand(8, 32, 32, 3).astype(np.float32),
        "label": rs.randint(0, 3, (8, 32, 32)).astype(np.int32),
    }

    # single device
    single = {k: jax.device_put(v, jax.devices()[0]) for k, v in batch_np.items()}
    state_a, loss_a = one_step(single)

    # sharded over the data axis
    sharded = shard_batch(env.mesh, batch_np)
    state_b, loss_b = one_step(sharded)

    assert abs(loss_a - loss_b) < 1e-5, (loss_a, loss_b)
    # batch_stats (global-batch BN moments) agree tightly — this is the
    # SyncBN guarantee
    for a, b in zip(jax.tree_util.tree_leaves(state_a.batch_stats),
                    jax.tree_util.tree_leaves(state_b.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # params agree up to fp32 reduction-order noise: sharded conv grads sum
    # partials in a different order, and BN backward (rsqrt of tiny
    # variances on these small test features) amplifies ulp-level wobble;
    # observed max ~1.7e-3 after one lr=0.1 step
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
