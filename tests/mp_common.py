"""Shared construction for the REAL 2-process tests (VERDICT r3 missing #2).

Imported by BOTH the pytest parent (single process, 8 virtual devices via
conftest) and ``mp_worker.py`` (2 processes x 4 devices each over
``jax.distributed``). Everything is deterministic so the 2-process global
mesh must reproduce the single-process 8-device run bit-for-bit: same
model init (fixed PRNGKey), same optimizer, same global batch rows per
step, same GSPMD program over the same 8-device data axis.

Parity anchor: the reference's pod path — per-host data sharding
(``core_train.py:186-195`` AutoShardPolicy.DATA) over a multi-host
TPUStrategy (``distribution/distribution_utils.py:13-46``).
"""

from __future__ import annotations

import numpy as np

GLOBAL_BATCH = 8
SIZE = 16
NC = 4
N_STEPS = 3
N_SAMPLES = 32
LOSS_FMT = "MPLOSS"  # worker stdout protocol: "MPLOSS <rank> <step> <val>"


def make_model():
    import jax.numpy as jnp  # noqa: F401

    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.nn.heads.aspp import ASPP

    # head-only model (PlaceHolder-backbone style): small enough that two
    # processes compile it in seconds, yet it carries sync-BN (cross-
    # process batch moments), an image-level global pool, and the
    # upsample+CE composition — the pieces whose collectives differ
    # between 1 and 2 processes
    return SegManaged(
        backbone=None,
        head=ASPP(filters=8, atrous_rates=(1, 2), dropout_rate=0.0),
        num_class=NC,
        loss_reduction="all_mean",
    )


def make_data():
    rng = np.random.RandomState(0)
    images = rng.randn(N_SAMPLES, SIZE, SIZE, 3).astype(np.float32)
    labels = rng.randint(0, NC, (N_SAMPLES, SIZE, SIZE)).astype(np.int32)
    labels[:, :2] = 255  # exercise the ignore mask through the collective
    return images, labels


def batch_rows(step: int) -> np.ndarray:
    """The GLOBAL batch's sample rows for a step — identical on every
    process (the per-process loader slice is taken from this)."""
    rng = np.random.RandomState(100 + step)
    return rng.choice(N_SAMPLES, GLOBAL_BATCH, replace=False)


def build_state(model):
    import jax
    import jax.numpy as jnp

    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import create_train_state

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((GLOBAL_BATCH, SIZE, SIZE, 3)),
        train=False,
    )
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.05,
                          decay_strategy=None, sgd_momentum=0.9)
    return create_train_state(model, jax.random.PRNGKey(0), None, tx,
                              variables=variables)


def replicate_state(mesh, state):
    """Host-round-trip the state onto a replicated sharding over the FULL
    (possibly multi-process) mesh. Every process computes identical values
    (same PRNGKey), so the global device_put is consistent."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, jax.Array) or isinstance(x, np.ndarray):
            return jax.device_put(np.asarray(x), rep)
        return x

    return jax.tree_util.tree_map(put, state)


def run_steps(mesh, model, state, n_steps: int = N_STEPS):
    """Run the DP train steps; each process feeds only ITS contiguous
    local slice of the global batch (the loader-partition contract:
    process p owns mesh rows [p*per, (p+1)*per))."""
    import jax

    from iseg_tpu.core.train import make_train_step
    from iseg_tpu.parallel.mesh import shard_batch

    images, labels = make_data()
    step_fn = make_train_step(model.build_loss_fn(), donate=False)
    pc, pi = jax.process_count(), jax.process_index()
    per = GLOBAL_BATCH // pc
    rng = jax.random.PRNGKey(0)
    losses = []
    for s in range(n_steps):
        rows = batch_rows(s)[pi * per : (pi + 1) * per]
        batch = shard_batch(
            mesh, {"image": images[rows], "label": labels[rows]})
        state, parts = step_fn(state, batch, rng)
        losses.append(float(np.asarray(jax.device_get(parts["loss"]))))
    return losses, state
