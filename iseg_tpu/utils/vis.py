"""Visualization manager: a global tensor-record registry for debugging.

Parity with the reference's ``vis/vismanager.py:20-58``
``get_visualization_manager``. Inside jit, tensors are captured via
``jax.debug.callback`` so recording works from compiled code.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


class VisualizationManager:
    def __init__(self):
        self.enabled = False
        self._records: dict[str, list] = {}

    def record(self, name: str, tensor: Any) -> Any:
        """Record a tensor under ``name`` (identity passthrough). Works both
        eagerly and under jit.

        The ``enabled`` gate is checked INSIDE the host callback, at run
        time: a trace-time check would bake the gate into the compiled
        program, so toggling ``enabled`` after the first jit compile would
        silently do nothing in either direction (the reference gates per
        call, ``vis/vismanager.py:20-58``). Cost when disabled: the
        device->host transfer of recorded tensors still happens — keep
        ``record`` calls out of steady-state hot loops, or slice what you
        record."""

        def _store(x):
            if self.enabled:
                self._records.setdefault(name, []).append(np.asarray(x))

        jax.debug.callback(_store, tensor)
        return tensor

    def get(self, name: str) -> list:
        return self._records.get(name, [])

    def names(self) -> list[str]:
        return sorted(self._records)

    def clear(self) -> None:
        self._records.clear()


_MANAGER: Optional[VisualizationManager] = None


def get_visualization_manager() -> VisualizationManager:
    global _MANAGER
    if _MANAGER is None:
        _MANAGER = VisualizationManager()
    return _MANAGER
