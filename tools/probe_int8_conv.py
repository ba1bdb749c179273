"""Probe: is int8 x int8 -> int32 convolution fast on this TPU?

v5e lists 394 int8 TOPS vs 197 bf16 TFLOPS. If XLA lowers s8 convs onto
the int8 MXU path, serving-time quantized convnets can ~2x. Measures the
headline model's hot conv geometries, bf16 vs int8, one chained dispatch.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def conv(x, w, d=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else None,
    )


def timeit(f, *args, n=20):
    def chained(args):
        def body(carry, _):
            r = f(*args)
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
    rs = np.random.RandomState(0)
    geoms = [
        ("res4 256ch d1", 16, 32, 256, 256, 1),
        ("res5 512ch d2", 16, 32, 512, 512, 2),
        ("aspp 2048->256 d6", 16, 32, 2048, 256, 6),
        ("res2 64ch 128sp", 16, 128, 64, 64, 1),
    ]
    print(f"{'geom':20} {'bf16_ms':>8} {'int8_ms':>8} {'speedup':>8}")
    for tag, b, hw, cin, cout, d in geoms:
        xb = jnp.asarray(rs.rand(b, hw, hw, cin), jnp.bfloat16)
        wb = jnp.asarray(rs.rand(3, 3, cin, cout) * 0.01, jnp.bfloat16)
        xi = jnp.asarray(rs.randint(-127, 128, (b, hw, hw, cin)), jnp.int8)
        wi = jnp.asarray(rs.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)
        tb = timeit(functools.partial(conv, d=d), xb, wb)
        ti = timeit(functools.partial(conv, d=d), xi, wi)
        print(f"{tag:20} {tb*1e3:8.2f} {ti*1e3:8.2f} {tb/ti:8.2f}x")


if __name__ == "__main__":
    main()
