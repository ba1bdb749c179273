"""JPU-head breakdown + headline-conv re-probe (round 4).

Two questions, both with the calibrated scan harness (probe_util):

1. Where do the JPU head's 9.6 ms go (BENCH_NOTES round-4 HRNet table:
   the one remaining lever after the W-fold)?  Sub-units at the exact
   HRNet-W48+JPU geometry (endpoints os8 96ch@64^2 / os16 192ch@32^2 /
   os32 384ch@16^2, b8, bf16, training BN):
   in-convs, resize+concat, one dilated separable branch (and its
   depthwise/pointwise/BN parts), all four branches.

2. Re-measure the headline model's hot 3x3 convs (ResNet-50+ASPP os16
   512^2 b16) against their MXU floors. The round-2 numbers
   (BENCH_NOTES "dilated-conv roofline probe": res4 17%, res3 17%) were
   taken with the pre-calibration harness whose per-iteration scan
   bookkeeping (~0.2-0.3 ms) and missing anti-DCE guard most distort
   exactly these small fast ops — worth one honest re-measurement
   before believing a 5x-off-floor reading.

Usage (TPU): python tools/probe_jpu.py [jpu] [convs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/iseg_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn  # noqa: E402

from probe_util import time_grad_fn, time_module  # noqa: E402

from iseg_tpu.nn.conv import ConvNormAct, SepConvNormAct  # noqa: E402
from iseg_tpu.nn.heads.jpu import JointPyramidUpsampling  # noqa: E402
from iseg_tpu.ops.resize import resize_image  # noqa: E402

PEAK = 197e12
BW = 819e9
BF16 = jnp.bfloat16

ENDPOINTS = [(8, 64, 64, 96), (8, 32, 32, 192), (8, 16, 16, 384)]
CONCAT = (8, 64, 64, 1536)


class InConvs(nn.Module):
    """The three endpoint convs + upsample + concat (JPU front half)."""

    with_resize: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = True):
        convs = [
            ConvNormAct(filters=512, kernel_size=3, name=f"in_conv{i}",
                        dtype=BF16)(f, train=train)
            for i, f in enumerate(feats)
        ]
        if not self.with_resize:
            return convs
        hw = (convs[0].shape[1], convs[0].shape[2])
        convs = [c if c.shape[1:3] == hw else resize_image(c, hw, "bilinear")
                 for c in convs]
        return jnp.concatenate(convs, axis=-1)


class Branches(nn.Module):
    """The four dilated separable branches on the concat tensor."""

    rates: tuple = (1, 2, 4, 8)
    norm_between: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        outs = [
            SepConvNormAct(filters=256, kernel_size=3, dilation=r,
                           norm_between=self.norm_between,
                           name=f"dilated{r}", dtype=BF16)(x, train=train)
            for r in self.rates
        ]
        return jnp.concatenate(outs, axis=-1)


def run_jpu():
    print("== JPU head sub-units (fwd+bwd, training BN, bf16, b8) ==",
          flush=True)
    rows = [
        ("full JPU", JointPyramidUpsampling(filters=512, dtype=BF16),
         ENDPOINTS),
        ("in_convs+resize+concat", InConvs(), ENDPOINTS),
        ("branches x4 (BN between)", Branches(), [CONCAT]),
        ("branches x4 (no BN between)", Branches(norm_between=False),
         [CONCAT]),
        ("one branch d1", Branches(rates=(1,)), [CONCAT]),
        ("one branch d8", Branches(rates=(8,)), [CONCAT]),
    ]
    for name, mod, shapes in rows:
        ms = time_module(mod, shapes, iters=64)
        print(f"{name:30s} {ms:7.3f} ms", flush=True)

    # parts of one branch, as pure fns (no BN)
    x = jnp.asarray(np.random.RandomState(0).rand(*CONCAT), BF16)
    wd = jnp.asarray(np.random.RandomState(1).rand(3, 3, 1, 1536) * 0.1, BF16)
    wp = jnp.asarray(np.random.RandomState(2).rand(1, 1, 1536, 256) * 0.1,
                     BF16)

    def depthwise(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=1536)

    def pointwise(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ms_d = time_grad_fn(depthwise, x, wd, iters=64)
    ms_p = time_grad_fn(pointwise, x, wp, iters=64)
    nbytes = np.prod(CONCAT) * 2
    # depthwise fwd+bwd HBM floor: fwd reads x + writes y; bwd reads dy
    # twice (dx and dw) and writes dx — ~5 passes over the 100 MB tensor
    print(f"{'depthwise 3x3 (pure)':30s} {ms_d:7.3f} ms   "
          f"(5-pass HBM floor {5 * nbytes / BW * 1e3:.3f} ms)")
    flops_p = 2 * 8 * 64 * 64 * 1536 * 256
    print(f"{'pointwise 1536->256 (pure)':30s} {ms_p:7.3f} ms   "
          f"(MXU fwd+bwd floor {3 * flops_p / PEAK * 1e3:.3f} ms)")


def run_convs():
    print("== headline hot 3x3 convs vs MXU floor (fwd+bwd, bf16, b16, "
          "calibrated harness) ==", flush=True)
    # (name, HW, Cin, Cout, dilation, per-step count in ResNet50+ASPP os16)
    classes = [
        ("res3 128ch @64 d1", 64, 128, 128, 1, 4),
        ("res4 256ch @32 d1", 32, 256, 256, 1, 6),
        ("res5 512ch @32 d2", 32, 512, 512, 2, 3),
        ("aspp 2048->256 @32 d6", 32, 2048, 256, 6, 3),
    ]
    for name, hw, cin, cout, d, count in classes:
        x = jnp.asarray(np.random.RandomState(0).rand(16, hw, hw, cin), BF16)
        w = jnp.asarray(
            np.random.RandomState(1).rand(3, 3, cin, cout) * 0.05, BF16)

        def conv(x, w, d=d):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        ms = time_grad_fn(conv, x, w, iters=64)
        flops = 2 * 16 * hw * hw * 9 * cin * cout
        floor = 3 * flops / PEAK * 1e3
        print(f"{name:24s} {ms:7.3f} ms  (MXU fwd+bwd floor {floor:.3f}, "
              f"{floor / ms * 100:5.1f}% of floor, x{count}/step)",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["jpu", "convs"]
    if "jpu" in which:
        run_jpu()
    if "convs" in which:
        run_convs()
