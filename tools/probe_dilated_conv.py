"""Probe: XLA dilated conv vs tap-decomposed matmul, per hot geometry.

For each 3x3-conv geometry in the os16 ResNet-50+ASPP headline model,
time fwd and fwd+bwd of:
  a) lax.conv_general_dilated (XLA's native lowering)
  b) tap decomposition: pad -> 9 shifted slices -> concat(9*Cin) -> one
     matmul (B*H*W, 9*Cin) @ (9*Cin, Cout). Backward is two matmuls.
and report % of the bf16 MXU roofline (197 TFLOP/s on v5e) each achieves.

Run on TPU: python tools/probe_dilated_conv.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197e12


def conv_ref(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_taps(x, w, d):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    # 9 shifted views, rows-major taps
    slices = []
    for di in (0, d, 2 * d):
        for dj in (0, d, 2 * d):
            slices.append(jax.lax.slice(
                xp, (0, di, dj, 0), (b, di + h, dj + wd, cin)))
    xcat = jnp.concatenate(slices, axis=-1)  # (B,H,W,9*Cin)
    wmat = w.transpose(0, 1, 2, 3).reshape(9 * cin, cout)
    return xcat.reshape(-1, 9 * cin) @ wmat

def timeit(f, *args, n=20):
    """Time f via ONE dispatch of an n-iteration lax.scan with a scalar
    data dependence between iterations — per-call tunnel dispatch overhead
    (~4 ms on this host) would otherwise swamp single-op timings."""

    def chained(args):
        def body(carry, _):
            # perturb the first arg by the carry so the body cannot be
            # hoisted out of the loop as loop-invariant
            a0 = args[0] + (carry * 1e-30).astype(args[0].dtype)
            r = f(a0, *args[1:])
            parts = r if isinstance(r, tuple) else (r,)
            s = sum(jnp.sum(p).astype(jnp.float32) for p in parts)
            return carry + s, ()

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return total

    cj = jax.jit(chained)
    _ = float(cj(args))  # compile + warm
    t0 = time.perf_counter()
    _ = float(cj(args))
    return (time.perf_counter() - t0) / n


def main():
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iseg_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dt = jnp.bfloat16
    geoms = [
        # (tag, B, H, Cin, Cout, d)
        ("res4 d1", 16, 32, 256, 256, 1),
        ("res5 d2", 16, 32, 512, 512, 2),
        ("res5 d4", 16, 32, 512, 512, 4),
        ("res5 d8", 16, 32, 512, 512, 8),
        ("aspp d6", 16, 32, 2048, 256, 6),
        ("aspp d12", 16, 32, 2048, 256, 12),
        ("aspp d18", 16, 32, 2048, 256, 18),
        ("res3 d1 64sp", 16, 64, 128, 128, 1),
    ]
    rs = np.random.RandomState(0)
    print(f"{'geom':12} {'fwd_conv':>9} {'fwd_taps':>9} {'bwd_conv':>9} "
          f"{'bwd_taps':>9} {'%roof_c':>8} {'%roof_t':>8}")
    for tag, b, hw, cin, cout, d in geoms:
        x = jnp.asarray(rs.rand(b, hw, hw, cin), dt)
        w = jnp.asarray(rs.rand(3, 3, cin, cout) * 0.01, dt)
        gflop_fwd = b * hw * hw * 9 * cin * cout * 2 / 1e9

        f_conv = jax.jit(functools.partial(conv_ref, d=d))
        f_taps = jax.jit(functools.partial(conv_taps, d=d))

        def loss_c(x, w):
            return jnp.sum(conv_ref(x, w, d).astype(jnp.float32) ** 2)

        def loss_t(x, w):
            return jnp.sum(conv_taps(x, w, d).astype(jnp.float32) ** 2)

        g_conv = jax.jit(jax.grad(loss_c, argnums=(0, 1)))
        g_taps = jax.jit(jax.grad(loss_t, argnums=(0, 1)))

        # check numerics
        yc = np.asarray(f_conv(x, w), np.float32).reshape(-1, cout)
        yt = np.asarray(f_taps(x, w), np.float32).reshape(-1, cout)
        err = np.abs(yc - yt).max() / max(np.abs(yc).max(), 1e-6)
        assert err < 2e-2, (tag, err)

        tfc = timeit(f_conv, x, w)
        tft = timeit(f_taps, x, w)
        tbc = timeit(g_conv, x, w)
        tbt = timeit(g_taps, x, w)
        roof_c = gflop_fwd * 3 / 1e3 / tbc / (PEAK_TFLOPS / 1e12) * 100
        roof_t = gflop_fwd * 3 / 1e3 / tbt / (PEAK_TFLOPS / 1e12) * 100
        print(f"{tag:12} {tfc*1e3:8.2f}m {tft*1e3:8.2f}m {tbc*1e3:8.2f}m "
              f"{tbt*1e3:8.2f}m {roof_c:7.1f}% {roof_t:7.1f}%")


if __name__ == "__main__":
    main()
