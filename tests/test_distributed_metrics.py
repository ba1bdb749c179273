"""Distributed metric correctness: the jitted confusion-matrix update must
produce identical results when inputs are sharded over the 8-device mesh
(GSPMD inserts the cross-device reduction)."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.core.env import EnvConfig, common_env_setup
from iseg_tpu.metrics import MeanIoU
from iseg_tpu.parallel.mesh import shard_batch


def test_mean_iou_sharded_matches_local():
    env = common_env_setup(EnvConfig(mixed_precision=False))
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 5, (8, 16, 16)).astype(np.int32)
    labels[rng.rand(8, 16, 16) < 0.1] = 255
    preds = rng.randint(0, 5, (8, 16, 16)).astype(np.int32)

    m_local = MeanIoU(5)
    m_local.update_state(jnp.asarray(labels), jnp.asarray(preds))

    m_sharded = MeanIoU(5)
    batch = shard_batch(env.mesh, {"l": labels, "p": preds})
    m_sharded.update_state(batch["l"], batch["p"])

    np.testing.assert_allclose(m_sharded.total_cm, m_local.total_cm)
    assert abs(m_sharded.result() - m_local.result()) < 1e-12
