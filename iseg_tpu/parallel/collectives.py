"""Explicit collective helpers.

The reference exposes one explicit collective, ``all_reduce_values``
(``distribution/distribution_utils.py:158-169``, a ReplicaContext
all-reduce SUM) consumed by SyncBN and cross-replica stats. Under GSPMD most
reductions are inserted automatically; these helpers exist for shard_map /
pmap code paths and for parity of the API surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_reduce_values(x, axis_name: str = "data", op: str = "sum"):
    """Cross-replica all-reduce inside a ``shard_map``/``pmap`` context.

    Reference ``distribution/distribution_utils.py:158`` (SUM only there;
    mean added here for convenience).
    """
    if op == "sum":
        return jax.lax.psum(x, axis_name)
    if op == "mean":
        return jax.lax.pmean(x, axis_name)
    raise ValueError(f"unsupported all-reduce op: {op}")


def global_batch_size(local_batch: int, axis_name: str = "data") -> jax.Array:
    return local_batch * jax.lax.psum(jnp.ones((), jnp.int32), axis_name)
