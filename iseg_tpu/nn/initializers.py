"""Shared / tied-weight initializers.

Parity with the reference ``initializers/shared_initializers.py:9-31``: an
initializer that returns one shared value across variables, with optional
transpose — used for weight tying (e.g. embedding <-> readout)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class SharedInitializer:
    """Initializer carrying a fixed value; each call returns it (optionally
    transposed), so multiple params start tied."""

    def __init__(self, value, transpose: bool = False):
        self._value = np.asarray(value)
        self.transpose = transpose

    def __call__(self, key, shape, dtype=jnp.float32):
        v = self._value.T if self.transpose else self._value
        if tuple(shape) != v.shape:
            raise ValueError(f"shared value shape {v.shape} != requested {shape}")
        return jnp.asarray(v, dtype)
