"""Pallas TPU kernel: whole-slab KV-cache row gather for beam decode.

Why a kernel: the beam step reorders the active KV cache by parent-beam
index every step — ``out[b, i] = cache[b, parent[b, i]]`` where each
``[b, i]`` row is a multi-megabyte contiguous slab.  This is pure data
movement (one read + one write of the slab bytes), but no XLA
formulation reaches that floor: ``tools/probe_beam_gather.py`` measures
the best lowering (vmap row-index) at ~26-66% of a materialized plain
copy of the same array, because XLA lowers the row index to a general
dynamic-gather rather than a block copy.  Here the parent indices are
scalar-prefetched (``PrefetchScalarGridSpec``), so the grid's BlockSpec
``index_map`` reads them directly and every grid step is a straight
VMEM block copy from the parent row — DMA at copy speed, no gather
lowering at all.

Used by :meth:`iseg_tpu.nlp.gemma.causal_lm.GemmaCausalLM` beam decode
(segmented cache policy).  Decode-only (no gradient).  Falls back to the
XLA vmap gather off-TPU or when the slab doesn't tile (see
``_choose_block``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _xla_gather(cache, parent):
    return jax.vmap(lambda c, idx: c[idx])(cache, parent)


def _choose_block(s: int) -> int:
    """Largest divisor of ``s`` that is <= 2048 and a sublane multiple."""
    best = 0
    for cs in range(min(s, 2048), 0, -1):
        if s % cs == 0 and cs % 8 == 0:
            best = cs
            break
    return best


def _kernel(parent_ref, in_ref, out_ref):
    del parent_ref  # consumed by the index_map, not the body
    out_ref[...] = in_ref[...]


def beam_cache_gather(cache, parent, interpret=None):
    """``out[b, i] = cache[b, parent[b, i]]`` at slab-copy speed.

    cache: ``[B, NB, *slab]`` (any trailing shape whose element count is
    a lane multiple); parent: ``[B, NB]`` integer parent-beam indices.
    Exact (a permutation of rows — bit-identical to the XLA gather).
    """
    b, nb = cache.shape[:2]
    slab = cache.shape[2:]
    flat = 1
    for d in slab:
        flat *= int(d)
    if interpret is None:
        # Off-TPU the XLA gather is the right lowering (interpret-mode
        # Pallas inside a decode scan is orders slower on CPU); pass
        # interpret=True explicitly to exercise the kernel in tests.
        if jax.devices()[0].platform != "tpu":
            return _xla_gather(cache, parent)
        interpret = False
    if flat % _LANE != 0:
        return _xla_gather(cache, parent)
    s = flat // _LANE
    cs = _choose_block(s)
    if cs < 64:  # degenerate tiling — the XLA gather beats a tiny grid
        return _xla_gather(cache, parent)

    x = cache.reshape(b, nb, s, _LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nb, s // cs),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cs, _LANE),
                lambda bi, ii, ji, parent_ref: (
                    bi, parent_ref[bi, ii], ji, 0),
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cs, _LANE), lambda bi, ii, ji, parent_ref: (bi, ii, ji, 0)
        ),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(parent.astype(jnp.int32), x)
    return out.reshape(cache.shape)
