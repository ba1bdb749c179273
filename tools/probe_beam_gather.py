"""Probe: KV-cache reorder formulations for beam decode (VERDICT r3 #6).

The beam step reorders the full cache [B*nb, L, 2, T, kvh, hd] by parent
index each step. bench_gemma_decode shows beam4 at 24% of its no-reorder
roofline — worse than the +2x cache-bytes the gather should cost, so the
LOWERING is suspect, not just the traffic.

Harness note: the cache is the SCAN CARRY (as in the real decode loop),
so every formulation must materialize its output — a mean-reduced output
lets XLA fuse the reorder into the reduction and report impossible
numbers (first draft of this probe measured 0.10 ms for a 0.31 ms-floor
copy that way).

Run on TPU: python tools/probe_beam_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, NB = 8, 4
L, T, KVH, HD = 12, 640, 1, 128
DTYPE = jnp.bfloat16
ITERS = 64


def main():
    rng = np.random.RandomState(0)
    cache = jnp.asarray(rng.randn(B, NB, L, 2, T, KVH, HD), DTYPE)
    parents = jnp.asarray(rng.randint(0, NB, (ITERS, B, NB)), jnp.int32)
    nbytes = cache.size * cache.dtype.itemsize
    floor_ms = 2 * nbytes / 819e9 * 1e3
    print(f"cache bytes: {nbytes/1e6:.1f} MB; reorder floor "
          f"(read+write @819GB/s): {floor_ms:.3f} ms")

    def timed(name, fn):
        def body(c, p):
            return fn(c, p), None

        scan = jax.jit(
            lambda c: jax.lax.scan(body, c, parents)[0])
        out = scan(cache)
        out.block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            scan(cache).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / ITERS
        print(f"{name:34s} {ms:7.3f} ms  ({floor_ms/ms*100:5.1f}% of floor)",
              flush=True)
        return ms

    # 0. materialized plain copy at this exact shape: the achievable
    # floor GIVEN the layout. The perturbation must depend on the
    # per-step xs or the loop body gets simplified away.
    def copy_dep(c, p):
        return c + (p.sum().astype(jnp.float32) * 1e-9).astype(DTYPE)

    timed("copy (xs-dependent eps)", copy_dep)

    # 0b. same copy with [*, T, KVH*HD] trailing dims (sublane-friendly)
    def copy_reshaped(c, p):
        eps = (p.sum().astype(jnp.float32) * 1e-9).astype(DTYPE)
        flat = c.reshape(B, NB, L, 2, T, KVH * HD)
        return (flat + eps).reshape(c.shape)

    timed("copy ([T,128] tail reshape)", copy_reshaped)

    # 1. current: vmap row-gather
    timed("vmap c[idx] (current)",
          lambda c, p: jax.vmap(lambda cc, ii: cc[ii])(c, p))

    # 1b. vmap row-gather on the [*, T, 128]-tailed cache
    def vmap_reshaped(c, p):
        flat = c.reshape(B, NB, L * 2, T, KVH * HD)
        out = jax.vmap(lambda cc, ii: cc[ii])(flat, p)
        return out.reshape(c.shape)

    timed("vmap c[idx] ([T,128] tail)", vmap_reshaped)

    # 2. take_along_axis with broadcast index
    def taa(c, p):
        idx = p.reshape(B, NB, 1, 1, 1, 1, 1)
        return jnp.take_along_axis(c, idx, axis=1)

    timed("take_along_axis", taa)

    # 3. one-hot matmul permutation (streamed, exact for 0/1 weights)
    def onehot(c, p):
        oh = jax.nn.one_hot(p, NB, dtype=DTYPE)  # [B, new, old]
        return jnp.einsum("bij,bj...->bi...", oh, c)

    timed("one-hot einsum", onehot)

    # 4. one-hot matmul on a 2D-flattened cache (one batched GEMM)
    def onehot2d(c, p):
        oh = jax.nn.one_hot(p, NB, dtype=DTYPE)
        flat = c.reshape(B, NB, -1)
        return jnp.einsum("bij,bjk->bik", oh, flat).reshape(c.shape)

    timed("one-hot einsum (flat2d)", onehot2d)

    # 5. masked-sum select (VPU broadcast-multiply-accumulate, fusible)
    def select(c, p):
        acc = jnp.zeros_like(c)
        for s in range(NB):
            m = (p == s).reshape(B, NB, 1, 1, 1, 1, 1).astype(DTYPE)
            acc = acc + m * c[:, s:s + 1]
        return acc

    timed("masked-sum select", select)

    # 6. Pallas slab-copy gather: scalar-prefetched parent indices drive
    # the BlockSpec index_map, so every grid step is a straight DMA block
    # copy from the parent row (ops/pallas/cache_gather.py).
    from iseg_tpu.ops.pallas.cache_gather import beam_cache_gather

    timed("pallas slab gather", beam_cache_gather)

    out_ref = jax.vmap(lambda cc, ii: cc[ii])(cache, parents[0])
    out_pl = beam_cache_gather(cache, parents[0])
    assert jnp.array_equal(out_ref, out_pl), "pallas gather mismatch"
    print("pallas gather bit-exact vs vmap gather: ok")


if __name__ == "__main__":
    main()
