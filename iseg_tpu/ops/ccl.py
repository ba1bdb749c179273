"""Connected-components labeling, XLA/TPU-compatible.

Parity with the reference ``ops/ccl.py`` (``label_components`` :28): the
reference runs a flood fill with a tensor-array stack inside nested
``tf.while_loop``s (all ``jit_compile=True``). The TPU-native algorithm
here is **vectorized min-label propagation**: initialize every foreground
pixel with its own linear index and iterate "take the min label over my
neighborhood" until fixpoint — each iteration is a handful of shifted
``minimum`` ops on the VPU (no scalar stack), and the ``lax.while_loop``
converges in O(component diameter) steps.

Labels are arbitrary-but-distinct per component (min linear index + 1),
background = 0; ``relabel_sequential`` compacts them host-side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.int32(2**30)


def _neighbor_min(labels: jax.Array, connectivity: int) -> jax.Array:
    """Min over the 4- or 8-neighborhood (labels: [..., H, W])."""
    big = _BIG

    def shift(x, dy, dx):
        pads = [(0, 0)] * (x.ndim - 2) + [
            (max(dy, 0), max(-dy, 0)),
            (max(dx, 0), max(-dx, 0)),
        ]
        padded = jnp.pad(x, pads, constant_values=big)
        h, w = x.shape[-2], x.shape[-1]
        start_y = max(-dy, 0)
        start_x = max(-dx, 0)
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(padded, start_y, start_y + h, axis=-2),
            start_x,
            start_x + w,
            axis=-1,
        )

    offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 8:
        offsets += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    out = labels
    for dy, dx in offsets:
        out = jnp.minimum(out, shift(labels, dy, dx))
    return out


def label_components(mask: jax.Array, connectivity: int = 4) -> jax.Array:
    """Label connected foreground components (reference ``ops/ccl.py:28``).

    Args:
      mask: [H, W] or [N, H, W] bool/int foreground mask.
      connectivity: 4 or 8.
    Returns int32 labels, 0 for background, a distinct positive id per
    component.
    """
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    mask = mask.astype(jnp.bool_)
    n, h, w = mask.shape

    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w)
    labels = jnp.where(mask, jnp.broadcast_to(idx, (n, h, w)), _BIG)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        new = jnp.where(mask, _neighbor_min(labels, connectivity), _BIG)
        new = jnp.minimum(labels, new)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    out = jnp.where(mask, labels + 1, 0).astype(jnp.int32)
    if squeeze:
        out = out[0]
    return out


def relabel_sequential(labels: np.ndarray) -> np.ndarray:
    """Host-side compaction of arbitrary component ids to 1..K."""
    labels = np.asarray(labels)
    uniq = np.unique(labels)
    uniq = uniq[uniq != 0]
    out = np.zeros_like(labels)
    for new_id, old in enumerate(uniq, start=1):
        out[labels == old] = new_id
    return out
