"""Mesh-aware ``with_sharding_constraint`` shorthand.

Shared by every module that opts into GSPMD sharding via constructor
axis-name fields (``nlp/gemma/model.py`` SP, ``nn/moe.py`` EP): a no-op
when every axis is unsharded OR no mesh is in context, so an
axis-configured module still inits/runs unsharded anywhere. Callers
enable sharding by running under ``jax.set_mesh(mesh)``.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

__all__ = ["constrain"]


def constrain(x, *spec):
    if all(s is None for s in spec):
        return x
    if jax.sharding.get_abstract_mesh().empty:
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))
