"""Feature taps: capture intermediate activations from any module.

Parity with the reference's ``HookLayer`` (``utils/keras_ops.py:214-229``)
and ``capture_func`` duck-typing hook (:205-211). In flax the idiomatic
mechanism is ``nn.Module.sow`` into an ``intermediates`` collection; this
module provides the thin wrapper + retrieval helpers.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn


class HookPoint(nn.Module):
    """Identity layer that records its input into the ``intermediates``
    collection under its own name. Drop into any model:

        x = HookPoint(name="backbone_out")(x)

    then ``model.apply(vars, x, mutable=["intermediates"])`` returns the
    captured tensors."""

    @nn.compact
    def __call__(self, x):
        self.sow("intermediates", "tap", x)
        return x


def get_taps(mutated_collections: dict) -> dict[str, Any]:
    """Flatten the ``intermediates`` collection into {path: tensor}."""
    out = {}
    inter = mutated_collections.get("intermediates", {})

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            # sow stores a tuple of occurrences
            out[prefix] = tree[0] if isinstance(tree, tuple) and len(tree) == 1 else tree

    walk(inter, "")
    return out
