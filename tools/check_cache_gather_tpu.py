"""TPU gate check: compiled Mosaic lowering of the Pallas beam-gather.

The round-4 advisor flagged that ``ops/pallas/cache_gather.py`` was only
ever verified in interpret mode: the multi-block grid path (s > cs) and
the actual Mosaic compile were uncovered, so a hardware lowering bug
(e.g. a bf16 sublane split unaligned to the (16,128) tile) would ship
silently. This script runs ON THE REAL TPU:

  1. bit-exactness of the compiled kernel vs the XLA vmap gather on
     - the realistic Gemma beam active-cache shape (multi-block: the
       bf16 slab tiles into 9 grid steps of 2048 sublanes),
     - an odd-width bf16 slab that a 16-unaligned split would break
       (the new dtype-aware _choose_block must route it safely), and
     - a single-block f32 slab;
  2. scan-carry timing of kernel vs XLA gather on the realistic shape
     (the decision data for keeping the kernel as the default TPU path).

Exit 0 with "SKIPPED" when no TPU is attached (CI hosts); exit 1 on any
mismatch or compile failure. Run as the gate's ``tpu`` section:
``python tools/check_cache_gather_tpu.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# this script checks the KERNEL lowering — force the pallas path (the
# production default is the XLA gather, see cache_gather.py docstring)
os.environ["ISEG_CACHE_GATHER"] = "pallas"

import jax
import jax.numpy as jnp
import numpy as np


def _timed_scan(fn, cache, parents):
    def body(c, p):
        return fn(c, p), None

    scan = jax.jit(lambda c: jax.lax.scan(body, c, parents)[0])
    out = scan(cache)
    out.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        scan(cache).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return out, best / parents.shape[0] * 1e3  # ms per reorder


def main():
    if jax.default_backend() != "tpu":
        print("SKIPPED: no TPU attached (backend=%s)" % jax.default_backend())
        return 0

    from iseg_tpu.ops.pallas.cache_gather import (
        _choose_block, _xla_gather, beam_cache_gather)

    rng = np.random.RandomState(0)
    failures = 0

    # [B, NB, slab...] cases. First: Gemma-2b beam4 active cache at one
    # 256-token segment — slab [L=18, 2, T=256, kvh=1, hd=256], bf16,
    # s = 18*2*256*256/128 = 18432 -> cs = 2048, 9-block grid.
    cases = [
        ("beam4-active-multiblock", (4, 4, 18, 2, 256, 1, 256), jnp.bfloat16),
        ("odd-width-bf16", (2, 4, 433, 8, 128), jnp.bfloat16),
        ("single-block-f32", (2, 4, 5, 2, 128), jnp.float32),
    ]
    for name, shape, dtype in cases:
        cache = jnp.asarray(rng.randn(*shape), dtype)
        parent = jnp.asarray(
            rng.randint(0, shape[1], shape[:2]), jnp.int32)
        s = int(np.prod(shape[2:])) // 128
        cs = _choose_block(s, dtype)
        try:
            got = jax.jit(beam_cache_gather)(cache, parent)
            want = _xla_gather(cache, parent)
            exact = bool(jnp.array_equal(got, want))
        except Exception as e:  # compile failure IS the finding
            print(f"FAIL {name}: s={s} cs={cs} raised {type(e).__name__}: {e}")
            failures += 1
            continue
        print(f"{'ok  ' if exact else 'FAIL'} {name}: s={s} cs={cs} "
              f"blocks={s // cs if cs else '-'} bitexact={exact}")
        failures += 0 if exact else 1

    # Timing on the realistic multi-block case, scan-carry like decode.
    shape, dtype = (4, 4, 18, 2, 256, 1, 256), jnp.bfloat16
    cache = jnp.asarray(rng.randn(*shape), dtype)
    parents = jnp.asarray(rng.randint(0, 4, (32, 4, 4)), jnp.int32)
    nbytes = cache.size * cache.dtype.itemsize
    floor_ms = 2 * nbytes / 819e9 * 1e3
    out_k, ms_k = _timed_scan(
        lambda c, p: beam_cache_gather(c, p), cache, parents)
    out_x, ms_x = _timed_scan(_xla_gather, cache, parents)
    if not jnp.array_equal(out_k, out_x):
        print("FAIL scan-carry: kernel and XLA gather disagree after 32 steps")
        failures += 1
    print(f"timing (per reorder, {nbytes / 1e6:.1f} MB slab, "
          f"copy floor {floor_ms:.3f} ms): kernel {ms_k:.3f} ms "
          f"({floor_ms / ms_k * 100:.0f}% of floor), "
          f"xla {ms_x:.3f} ms ({floor_ms / ms_x * 100:.0f}%), "
          f"speedup {ms_x / ms_k:.2f}x")

    print("PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
