"""Tensor-parallel layout for Gemma params.

Parity with the reference ``nlp/gemma/gemma_backbone.py:200-271``
``get_layout_map``: QKV projections shard their head axis, attention output
and FFW weights shard appropriately over the ``model`` mesh axis; the
embedding shards its vocab axis. Expressed as ``PartitionSpec`` rules keyed
by param-path regex, applied with ``NamedSharding``.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iseg_tpu.parallel.mesh import MODEL_AXIS

# (path regex, PartitionSpec) — first match wins. Mirrors the reference's
# layout_map entries (gemma_backbone.py:200-271).
LAYOUT_RULES: tuple[tuple[str, P], ...] = (
    (r"token_embedding/embedding", P(MODEL_AXIS, None)),
    (r"attention/(query|key|value)/kernel", P(None, MODEL_AXIS, None)),
    (r"attention/attention_output/kernel", P(MODEL_AXIS, None, None)),
    (r"gating_ffw(_2)?/kernel", P(None, MODEL_AXIS)),
    (r"ffw_linear/kernel", P(MODEL_AXIS, None)),
)


def get_layout_map(params) -> Any:
    """PartitionSpec pytree matching ``params``' structure."""

    def spec_for(path, leaf):
        path_str = "/".join(
            str(getattr(p, "key", p)) for p in path
        )
        for pattern, spec in LAYOUT_RULES:
            if re.search(pattern, path_str):
                if len(spec) <= leaf.ndim:
                    return P(*spec, *([None] * (leaf.ndim - len(spec))))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_gemma_params(params, mesh: Mesh):
    """device_put params with the TP layout over ``mesh``."""
    specs = get_layout_map(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
