"""Device mesh construction and standard shardings.

Replaces the reference's strategy factory
(``distribution/distribution_utils.py:98`` ``get_distribution_strategy``) and
experimental DTensor mesh (``distribution/mesh_utils.py:11``). The TPU-native
design is a 2-D ``("data", "model")`` mesh:

* vision models train pure data-parallel (``model=1``), batch sharded on
  ``data``; gradients/BN stats reduce over ICI via GSPMD-inserted
  collectives,
* the Gemma LM module shards its QKV/FFW weights over ``model``
  (reference ``nlp/gemma/gemma_backbone.py:200-271`` layout map).

Multi-host (TPU pod): ``jax.distributed.initialize()`` before mesh creation;
the same code path covers one chip to a pod (reference's TPUStrategy +
``AutoShardPolicy.DATA`` pod plumbing in ``core_train.py:186-195``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    devices: Sequence[jax.Device] | None = None,
    model_parallelism: int = 1,
    axis_names: tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a ``(data, model)`` mesh over all (or the given) devices.

    ``model_parallelism`` must divide the device count; the data axis takes
    the rest. With the default ``model_parallelism=1`` this is plain DP —
    the parity configuration for the reference's MirroredStrategy /
    TPUStrategy (``distribution/distribution_utils.py:13-95``).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallelism != 0:
        raise ValueError(
            f"model_parallelism={model_parallelism} does not divide {n} devices"
        )
    grid = np.asarray(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding for an activation batch: dim 0 over ``data``, rest replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = DATA_AXIS) -> Any:
    """Device-put a pytree of host arrays with dim-0 sharded over ``data``.

    Host-side analogue of the reference's dataset distribution
    (``core_train.py:155-195``): each process contributes its LOCAL shard
    (the loader gives every host a disjoint slice). Multi-host assembly
    goes through ``jax.make_array_from_process_local_data`` — a plain
    ``device_put`` against a non-addressable sharding would treat each
    host's local batch as the GLOBAL array and silently slice away
    everyone else's rows.
    """

    n_shards = mesh.shape[axis]
    multihost = jax.process_count() > 1

    def _put(x):
        if isinstance(x, jax.Array) and not multihost:
            # already on device (e.g. DeviceResidentDataset batches):
            # reshard device-to-device — np.asarray here would bounce the
            # whole batch through the host every step
            if x.shape[0] % n_shards != 0:
                raise ValueError(
                    f"global batch {x.shape[0]} is not divisible by the "
                    f"{axis}-axis size {n_shards}")
            return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))
        x = np.asarray(x)
        sharding = batch_sharding(mesh, x.ndim, axis)
        if multihost:
            local = x.shape[0]
            per_process = n_shards // jax.process_count()
            if per_process == 0 or local % per_process != 0:
                raise ValueError(
                    f"local batch {local} is not divisible by this "
                    f"process's {axis}-axis share ({per_process})")
            global_shape = (local * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape)
        if x.shape[0] % n_shards != 0:
            raise ValueError(
                f"global batch {x.shape[0]} is not divisible by the "
                f"{axis}-axis size {n_shards}; use a batch that is a "
                f"multiple of the device count (the reference drops "
                f"remainders for the same reason, core_train.py:155-183)"
            )
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))

    return jax.tree_util.tree_map(_put, batch)


@dataclasses.dataclass
class MeshEnv:
    """Bundle returned by ``common_env_setup`` (reference ``core_env.py:16``)."""

    mesh: Mesh
    seed: int
    compute_dtype: Any
    param_dtype: Any

    @property
    def num_devices(self) -> int:
        return self.mesh.size

    @property
    def data_parallelism(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def model_parallelism(self) -> int:
        return self.mesh.shape.get(MODEL_AXIS, 1)
