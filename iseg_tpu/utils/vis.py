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
        eagerly and under jit."""
        if not self.enabled:
            return tensor

        def _store(x):
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
