"""Pallas slab-copy cache gather (ops/pallas/cache_gather.py).

The beam decode path reorders its active KV cache with this kernel on
TPU; off-TPU it routes to the XLA vmap gather, so correctness of the
kernel itself is pinned here in interpret mode against the XLA gather.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.ops.pallas.cache_gather import (
    _choose_block,
    _xla_gather,
    beam_cache_gather,
)


@pytest.mark.parametrize(
    "b,nb,slab,dtype",
    [
        (2, 4, (3, 2, 64, 1, 128), jnp.bfloat16),  # beam active-cache shape
        (1, 2, (2, 2, 40, 2, 64), jnp.float32),  # odd widths, still tiles
        (3, 3, (512,), jnp.bfloat16),  # minimal slab
        (2, 4, (2, 2, 512, 2, 128), jnp.bfloat16),  # multi-block: s=4096>2048
        (1, 2, (433, 8, 128), jnp.bfloat16),  # odd W: s=8*433>2048,
        # only a 2^3 factor -> no bf16-tile-aligned split exists -> fallback
    ],
)
def test_kernel_matches_xla_gather(b, nb, slab, dtype):
    rng = np.random.RandomState(0)
    cache = jnp.asarray(rng.randn(b, nb, *slab), dtype)
    parent = jnp.asarray(rng.randint(0, nb, (b, nb)), jnp.int32)
    got = beam_cache_gather(cache, parent, interpret=True)
    want = _xla_gather(cache, parent)
    assert got.dtype == want.dtype and got.shape == want.shape
    assert jnp.array_equal(got, want)


def test_fallback_on_untileable_slab():
    # slab element count not a lane multiple -> XLA fallback, still exact
    rng = np.random.RandomState(1)
    cache = jnp.asarray(rng.randn(2, 3, 5, 7), jnp.float32)
    parent = jnp.asarray(rng.randint(0, 3, (2, 3)), jnp.int32)
    got = beam_cache_gather(cache, parent, interpret=True)
    assert jnp.array_equal(got, _xla_gather(cache, parent))


def test_choose_block_divides_and_aligns():
    f32, bf16 = jnp.float32, jnp.bfloat16
    for s in (24 * 256, 24 * 250, 6144, 8, 2048 * 3, 40):
        cs = _choose_block(s, f32)
        assert cs > 0 and s % cs == 0 and cs <= 2048
        if cs < s:  # any split must land on the f32 sublane tile (8,128)
            assert cs % 8 == 0
    # bf16 tiles at (16,128): splits must be 16-aligned even when an
    # 8-aligned divisor exists (the round-4 advisor's Mosaic-reject case)
    s = 8 * 433  # > 2048, carries only a 2^3 factor
    assert _choose_block(s, bf16) == 0  # no 16-aligned split -> fallback
    assert _choose_block(4096, bf16) == 2048  # aligned split OK
    # single block (cs == s) has no split, so no alignment constraint
    assert _choose_block(1000, bf16) == 1000
    assert _choose_block(7, f32) == 7


def test_jittable_under_scan():
    # the beam step calls this inside lax.scan with the cache as carry
    rng = np.random.RandomState(2)
    cache = jnp.asarray(rng.randn(2, 2, 2, 2, 16, 1, 128), jnp.bfloat16)
    parents = jnp.asarray(rng.randint(0, 2, (4, 2, 2)), jnp.int32)

    def body(c, p):
        return beam_cache_gather(c, p, interpret=True), None

    out = jax.jit(lambda c: jax.lax.scan(body, c, parents)[0])(cache)
    want = cache
    for i in range(4):
        want = _xla_gather(want, parents[i])
    assert jnp.array_equal(out, want)
