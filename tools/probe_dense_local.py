"""Probe: is deform_dense_local VPU-compute-bound or HBM-bound?

Times the op in isolation at InternImage-T stage geometries for several
clamp radii r. The displacement window is (K + 2r + 2)^2; if time scales
~linearly with window area the op is compute(VPU)-bound and a Pallas
rewrite buys little; if strongly sub-linear, XLA is already reusing tiles
and the op is near its memory floor.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=10):
    def chained(args):
        def body(carry, _):
            a0 = args[0] + (carry * 1e-30).astype(args[0].dtype)
            r = f(a0, *args[1:])
            return carry + jnp.sum(r).astype(jnp.float32), ()
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return total

    cj = jax.jit(chained)
    _ = float(cj(args))
    t0 = time.perf_counter()
    _ = float(cj(args))
    return (time.perf_counter() - t0) / n


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iseg_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from iseg_tpu.ops.deform import deform_dense_local

    rs = np.random.RandomState(0)
    # InternImage-T geometries after group folding: [B*G, H, W, gc]
    geoms = [("stage1 128^2", 32, 128, 16), ("stage3 32^2", 128, 32, 16)]
    for tag, bg, hw, gc in geoms:
        x = jnp.asarray(rs.rand(bg, hw, hw, gc), jnp.bfloat16)
        off = jnp.asarray(rs.uniform(-2, 2, (bg, hw, hw, 9, 2)), jnp.float32)
        mod = jnp.asarray(rs.rand(bg, hw, hw, 9), jnp.float32)
        for r in (1, 2, 3):
            f = functools.partial(deform_dense_local, kernel_size=3,
                                  max_offset=r)
            t = timeit(lambda xx, oo, mm: f(xx, oo, mm), x, off, mod)
            win = (3 + 2 * r) ** 2  # actually (2*(1+r+1)+1)^2 displacements
            lim = 1 + r + 1
            n_disp = (2 * lim + 1) ** 2
            gflops = bg * hw * hw * n_disp * (2 * 9 + 2 * gc) / 1e9
            print(f"{tag} r={r}: {t*1e3:7.2f} ms  ({n_disp} disp, "
                  f"~{gflops:.1f} GF -> {gflops/t/1e3:.1f} TF/s)")


if __name__ == "__main__":
    main()
