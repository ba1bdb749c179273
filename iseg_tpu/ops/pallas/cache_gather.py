"""Pallas TPU kernel: whole-slab KV-cache row gather for beam decode.

Why a kernel (hypothesis): the beam step reorders the active KV cache by
parent-beam index every step — ``out[b, i] = cache[b, parent[b, i]]``
where each ``[b, i]`` row is a multi-megabyte contiguous slab.  This is
pure data movement, and ``tools/probe_beam_gather.py`` measured XLA's
best lowering (vmap row-index) at ~26-66% of a materialized plain copy,
so a scalar-prefetched block-copy kernel (``PrefetchScalarGridSpec``;
every grid step is a straight VMEM block copy from the parent row)
looked like a win.

MEASURED on TPU v5e (round 5, ``tools/check_cache_gather_tpu.py`` +
``tools/bench_gemma_decode.py`` kernel-on/off A/B): it is NOT a win.
Isolated scan-carry reorder of the 75.5 MB beam4 active cache: kernel
0.84x the XLA gather (both far off the copy floor — the reorder is
latency/dispatch-bound at these slab counts, not DMA-bound).  End-to-end
decode tok/s: beam2 +0.9%, beam4 -0.4%, contrastive -2.2% — noise.  The
XLA gather is therefore the DEFAULT TPU path; the kernel is retained,
bit-exact and hardware-verified, behind ``ISEG_CACHE_GATHER=pallas``
for re-evaluation on other geometries/generations.

Used by :meth:`iseg_tpu.nlp.gemma.causal_lm.GemmaCausalLM` beam decode
(segmented cache policy).  Decode-only (no gradient).  Falls back to the
XLA vmap gather off-TPU or when the slab doesn't tile (see
``_choose_block``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128

# Gather implementation on TPU: "xla" (default — measured faster or
# equal at every benched geometry, see module docstring) or "pallas"
# (the block-copy kernel, kept for re-evaluation / A-B runs).
_USE_PALLAS = os.environ.get("ISEG_CACHE_GATHER", "xla") == "pallas"


def _xla_gather(cache, parent):
    return jax.vmap(lambda c, idx: c[idx])(cache, parent)


def _sublane_tile(dtype) -> int:
    """TPU/Mosaic native sublane tile for this dtype: (8,128) for 4-byte,
    (16,128) for 2-byte (bf16 — the default cache dtype), (32,128) for
    1-byte.  Splitting the sublane dim at offsets unaligned to this tile
    is rejected by Mosaic at compile time on hardware."""
    return 32 // jnp.dtype(dtype).itemsize


def _choose_block(s: int, dtype) -> int:
    """Largest divisor of ``s`` that is <= 2048 and, whenever it splits
    ``s`` (cs < s), a multiple of the dtype's sublane tile."""
    tile = _sublane_tile(dtype)
    if s <= 2048:
        return s  # single block: no sublane split, no alignment constraint
    best = 0
    for cs in range(2048, 0, -1):
        if s % cs == 0 and cs % tile == 0:
            best = cs
            break
    return best


def _kernel(parent_ref, in_ref, out_ref):
    del parent_ref  # consumed by the index_map, not the body
    out_ref[...] = in_ref[...]


def beam_cache_gather(cache, parent, interpret=None, backend=None):
    """``out[b, i] = cache[b, parent[b, i]]`` at slab-copy speed.

    cache: ``[B, NB, *slab]`` (any trailing shape whose element count is
    a lane multiple); parent: ``[B, NB]`` integer parent-beam indices.
    Exact (a permutation of rows — bit-identical to the XLA gather).

    ``backend``: platform the computation will be staged for.  Defaults
    to ``jax.default_backend()`` — a trace-time global, NOT the lowering
    context, so callers jitting for a non-default device (or AOT-lowering
    cross-platform) must pass it explicitly.
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
        if not _USE_PALLAS or (backend or jax.default_backend()) != "tpu":
            return _xla_gather(cache, parent)
        interpret = False
    if flat % _LANE != 0:
        return _xla_gather(cache, parent)
    s = flat // _LANE
    cs = _choose_block(s, cache.dtype)
    if cs < 64:  # degenerate/unaligned tiling — XLA gather beats a tiny grid
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
