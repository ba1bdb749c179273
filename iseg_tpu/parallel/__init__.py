"""Device-mesh and sharding utilities.

TPU-native replacement for the reference's ``distribution/`` package
(``distribution_utils.py``, ``mesh_utils.py``): instead of
``tf.distribute.Strategy`` objects, everything is a ``jax.sharding.Mesh``
plus ``NamedSharding`` specs consumed by a single jitted step; collectives
are inserted by GSPMD (or issued explicitly via ``psum``-family helpers).
"""

from iseg_tpu.parallel.mesh import (
    MeshEnv,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    DATA_AXIS,
    MODEL_AXIS,
)
from iseg_tpu.parallel.collectives import all_reduce_values
from iseg_tpu.parallel.pipeline import (
    pipeline_spmd,
    stack_params,
    unstack_params,
)
from iseg_tpu.parallel.ring import ring_attention
from iseg_tpu.parallel.fsdp import fsdp_spec, fsdp_shardings, shard_fsdp

__all__ = [
    "MeshEnv",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "all_reduce_values",
    "pipeline_spmd",
    "stack_params",
    "unstack_params",
    "ring_attention",
    "fsdp_spec",
    "fsdp_shardings",
    "shard_fsdp",
    "DATA_AXIS",
    "MODEL_AXIS",
]
