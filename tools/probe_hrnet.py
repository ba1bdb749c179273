"""HRNet-W48 512^2 b8 step breakdown + dual-roofline analysis
(VERDICT r3 next #3: where do the 109.7 ms go, and is 21% MFU the
architecture's ceiling on v5e or a lowering artifact?).

Methodology: every unit of the BASELINE #3 model is timed IN ISOLATION at
its exact training geometry — fwd+bwd through value_and_grad (anti-DCE'd),
BN in training mode — with the overhead-calibrated scan harness
(tools/probe_util.py; the axon tunnel costs ~22 ms per dispatch, so the
body is chained 64-128x and a null-scan baseline is subtracted).

The roofline section evaluates each residual-block conv class against
BOTH floors:
  * MXU floor: FLOPs / 197 TFLOP/s
  * HBM floor: (input + output + weight bytes) / 819 GB/s
HRNet's thin-channel branches (48ch at 128^2) have arithmetic intensity
FAR below the v5e ridge (~240 FLOP/byte), so the relevant bound is HBM,
not the MXU — "21% MFU" conflates the two. The probe reports achieved %
of the BINDING floor per class, plus lane-padded GEMM variants to check
whether padding the 48-wide output helps (it cannot, if the class is
bandwidth-bound — padding only adds bytes).

Usage (TPU): python tools/probe_hrnet.py [full] [units] [convs] [gemm]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/iseg_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn  # noqa: E402

from probe_util import time_fn, time_grad_fn, time_module  # noqa: E402

from iseg_tpu.backbones.hrnet import FuseLayer  # noqa: E402
from iseg_tpu.backbones.resnet import BasicBlock, BottleneckBlock  # noqa: E402
from iseg_tpu.nn.conv import ConvNormAct  # noqa: E402
from iseg_tpu.nn.heads.jpu import JointPyramidUpsampling  # noqa: E402

PEAK = 197e12
BW = 819e9
BF16 = jnp.bfloat16


class BranchBlocks(nn.Module):
    """One HRModule branch: 4 BasicBlocks at constant width."""

    ch: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        for k in range(4):
            x = BasicBlock(filters=self.ch, bn_epsilon=1e-3, dtype=BF16,
                           name=f"b{k}")(x, train=train)
        return x


class Stage1(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        for k in range(4):
            x = BottleneckBlock(filters=64, bn_epsilon=1e-3, dtype=BF16,
                                name=f"b{k}")(x, train=train)
        return x


# (name, module factory, input shapes, occurrences in HRNet-W48 @512^2 b8)
UNITS = [
    ("stem0 3->64 s2 @512", lambda: ConvNormAct(filters=64, kernel_size=3,
                                                strides=2, dtype=BF16),
     [(8, 512, 512, 3)], 1),
    ("stem1 64->64 s2 @256", lambda: ConvNormAct(filters=64, kernel_size=3,
                                                 strides=2, dtype=BF16),
     [(8, 256, 256, 64)], 1),
    ("stage1 4xbottleneck @128", Stage1, [(8, 128, 128, 64)], 1),
    ("transition1_0 256->48 @128", lambda: ConvNormAct(
        filters=48, kernel_size=3, dtype=BF16), [(8, 128, 128, 256)], 1),
    ("transition1_1 256->96 s2 @128", lambda: ConvNormAct(
        filters=96, kernel_size=3, strides=2, dtype=BF16),
     [(8, 128, 128, 256)], 1),
    ("blocks 48ch @128", lambda: BranchBlocks(ch=48),
     [(8, 128, 128, 48)], 8),
    ("blocks 96ch @64", lambda: BranchBlocks(ch=96), [(8, 64, 64, 96)], 8),
    ("blocks 192ch @32", lambda: BranchBlocks(ch=192),
     [(8, 32, 32, 192)], 7),
    ("blocks 384ch @16", lambda: BranchBlocks(ch=384),
     [(8, 16, 16, 384)], 3),
    ("fuse x2", lambda: FuseLayer(out_channels=(48, 96), dtype=BF16),
     [(8, 128, 128, 48), (8, 64, 64, 96)], 1),
    ("fuse x3", lambda: FuseLayer(out_channels=(48, 96, 192), dtype=BF16),
     [(8, 128, 128, 48), (8, 64, 64, 96), (8, 32, 32, 192)], 4),
    ("fuse x4", lambda: FuseLayer(out_channels=(48, 96, 192, 384),
                                  dtype=BF16),
     [(8, 128, 128, 48), (8, 64, 64, 96), (8, 32, 32, 192),
      (8, 16, 16, 384)], 3),
    ("transition2 96->192 s2 @64", lambda: ConvNormAct(
        filters=192, kernel_size=3, strides=2, dtype=BF16),
     [(8, 64, 64, 96)], 1),
    ("transition3 192->384 s2 @32", lambda: ConvNormAct(
        filters=384, kernel_size=3, strides=2, dtype=BF16),
     [(8, 32, 32, 192)], 1),
    ("JPU head @os8/16/32", lambda: JointPyramidUpsampling(
        filters=512, dtype=BF16),
     [(8, 64, 64, 96), (8, 32, 32, 192), (8, 16, 16, 384)], 1),
]


def run_units():
    print("== unit breakdown (fwd+bwd, training BN, bf16, calibrated) ==")
    total = 0.0
    for name, factory, shapes, count in UNITS:
        ms = time_module(factory(), shapes, iters=64)
        total += ms * count
        print(f"{name:34s} {ms:7.3f} ms x{count:2d} = {ms * count:7.2f} ms",
              flush=True)
    print(f"{'SUM of units':34s} {'':7s}      = {total:7.2f} ms")


def run_convs():
    """The actual 3x3 conv per block class, fwd-only and fwd+bwd, vs both
    floors. bytes = in + out + weights (bf16); flops = 2*M*9C*C."""
    print("== block-conv class vs MXU/HBM floors ==")
    classes = [("48ch @128", 128, 48, 128), ("96ch @64", 64, 96, 128),
               ("192ch @32", 32, 192, 112), ("384ch @16", 16, 384, 48)]
    tot_fwd_floor = tot_bwd_floor = 0.0
    for name, hw, c, count in classes:
        x = jnp.asarray(np.random.RandomState(0).rand(8, hw, hw, c), BF16)
        w = jnp.asarray(np.random.RandomState(1).rand(3, 3, c, c) * 0.1,
                        BF16)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        ms_f = max(time_fn(conv, x, w), 1e-4)  # clamp: below calib noise
        ms_fb = max(time_grad_fn(conv, x, w), 1e-4)
        m = 8 * hw * hw
        flops = 2 * m * 9 * c * c
        bytes_ = (2 * m * c) * 2 + 9 * c * c * 2  # in+out activ + weights
        t_mxu = flops / PEAK * 1e3
        t_bw = bytes_ / BW * 1e3
        floor_f = max(t_mxu, t_bw)
        # bwd: dgrad (same conv) + wgrad (correlation): ~2x flops, and
        # reads x, dy, writes dx, dw: ~2x bytes
        floor_fb = 3 * max(t_mxu, t_bw)
        bind = "HBM" if t_bw > t_mxu else "MXU"
        tot_fwd_floor += floor_f * count
        tot_bwd_floor += floor_fb * count
        print(f"{name:11s} fwd {ms_f:6.3f} ms (floor {floor_f:6.3f} {bind},"
              f" {floor_f / ms_f * 100:5.1f}%)  fwd+bwd {ms_fb:6.3f} ms "
              f"(floor {floor_fb:6.3f}, {floor_fb / ms_fb * 100:5.1f}%) "
              f"x{count}", flush=True)
    print(f"block-conv floors summed over the net: "
          f"fwd {tot_fwd_floor:.1f} ms, fwd+bwd {tot_bwd_floor:.1f} ms")


def run_gemm():
    """im2col GEMM + lane-padding check (secondary: the GEMM form pays a
    9x activation-read amplification the conv does not)."""
    print("== im2col GEMM per class + padded variants (bf16) ==")
    classes = [
        ("48ch @128", 8 * 128 * 128, 9 * 48, 48),
        ("96ch @64", 8 * 64 * 64, 9 * 96, 96),
        ("192ch @32", 8 * 32 * 32, 9 * 192, 192),
        ("384ch @16", 8 * 16 * 16, 9 * 384, 384),
    ]
    for name, m, k, n in classes:
        def gemm(a, b):
            return a @ b

        a = jnp.asarray(np.random.RandomState(0).rand(m, k), BF16)
        b = jnp.asarray(np.random.RandomState(1).rand(k, n), BF16)
        base = time_fn(gemm, a, b)
        b128 = jnp.asarray(
            np.random.RandomState(1).rand(k, ((n + 127) // 128) * 128), BF16)
        pad = time_fn(gemm, a, b128)
        t_bw = 2 * (m * k + m * n + k * n) / BW * 1e3
        print(f"{name:11s} [{m}x{k}]x[{k}x{n}]: {base:6.3f} ms "
              f"(HBM floor {t_bw:6.3f}, {t_bw / base * 100:5.1f}%) "
              f"N->128pad: {pad:6.3f} ms", flush=True)


def _fold_kernel_w(w):
    """Exact kernel transform for folding W by 2: conv3x3 stride-1 SAME on
    (N,H,W,C) == conv3x3 stride-1 SAME on (N,H,W/2,2C) with this kernel.
    Derivation: fine col 2q+b+dw = 2(q+e)+b' with b'=(b+dw)%2; each (b,dw)
    maps to one (e,b') tap, so the block kernel is 3-wide with half its
    (b',b) channel blocks structurally zero."""
    kh, kw, ci, co = w.shape
    assert kw == 3
    k = np.zeros((kh, 3, 2 * ci, 2 * co), w.dtype)
    for b in range(2):
        for dw in (-1, 0, 1):
            t = b + dw
            b2 = t % 2
            e = (t - b2) // 2
            k[:, e + 1, b2 * ci:(b2 + 1) * ci, b * co:(b + 1) * co] += \
                w[:, dw + 1]
    return k


def _fold_kernel_h(w):
    return np.transpose(
        _fold_kernel_w(np.transpose(w, (1, 0, 2, 3))), (1, 0, 2, 3))


def _fold_x_w(x):
    n, h, ww, c = x.shape
    return x.reshape(n, h, ww // 2, 2 * c)


def _fold_x_h(x):
    n, h, ww, c = x.shape
    return jnp.transpose(x.reshape(n, h // 2, 2, ww, c),
                         (0, 1, 3, 2, 4)).reshape(n, h // 2, ww, 2 * c)


def run_layouts():
    """Layout experiments for the 48ch @128 class (VERDICT r3 next #3):
    NCHW dimension numbers, and spatial-fold variants that repack W (and
    H) pairs into channels so 48ch becomes 96/192ch — trading structured-
    zero FLOPs (2x/4x) for full-lane HBM traffic (48/128 -> 96/128 ->
    192/256 utilization). The fold is EXACT (kernel transform verified
    here against the direct conv before timing)."""
    print("== 48ch @128 layout experiments ==")
    c, hw = 48, 128
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(8, hw, hw, c), BF16)
    w = (rs.rand(3, 3, c, c) * 0.1).astype(np.float32)
    wj = jnp.asarray(w, BF16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # numeric check of the fold transforms (fp32, small)
    xs = jnp.asarray(rs.rand(2, 8, 8, 5), jnp.float32)
    ws = rs.rand(3, 3, 5, 5).astype(np.float32)
    ref = conv(xs, jnp.asarray(ws))
    got_w = conv(_fold_x_w(xs), jnp.asarray(_fold_kernel_w(ws)))
    np.testing.assert_allclose(
        np.asarray(got_w).reshape(ref.shape), np.asarray(ref), atol=1e-5)
    got_hw = conv(_fold_x_h(_fold_x_w(xs)),
                  jnp.asarray(_fold_kernel_h(_fold_kernel_w(ws))))
    assert got_hw.shape == (2, 4, 4, 20)
    print("fold transforms: EXACT (fp32 check passed)")

    ms = max(time_fn(conv, x, wj), 1e-4)
    ms_b = max(time_grad_fn(conv, x, wj), 1e-4)
    print(f"NHWC baseline        fwd {ms:6.3f} ms  fwd+bwd {ms_b:6.3f} ms")

    xc = jnp.transpose(x, (0, 3, 1, 2))
    wc = jnp.transpose(wj, (3, 2, 0, 1))

    def conv_nchw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    ms = max(time_fn(conv_nchw, xc, wc), 1e-4)
    ms_b = max(time_grad_fn(conv_nchw, xc, wc), 1e-4)
    print(f"NCHW                 fwd {ms:6.3f} ms  fwd+bwd {ms_b:6.3f} ms")

    xw = _fold_x_w(x)
    kw = jnp.asarray(_fold_kernel_w(w), BF16)
    ms = max(time_fn(conv, xw, kw), 1e-4)
    ms_b = max(time_grad_fn(conv, xw, kw), 1e-4)
    print(f"W-fold (96ch @128x64) fwd {ms:6.3f} ms  fwd+bwd {ms_b:6.3f} ms")

    xhw = _fold_x_h(xw)
    khw = jnp.asarray(_fold_kernel_h(_fold_kernel_w(w)), BF16)
    ms = max(time_fn(conv, xhw, khw), 1e-4)
    ms_b = max(time_grad_fn(conv, xhw, khw), 1e-4)
    print(f"HW-fold (192ch @64x64) fwd {ms:6.3f} ms  fwd+bwd {ms_b:6.3f} ms")

    # the whole branch unit in folded domain: 8x the BasicBlock pair.
    # BN here is plain (2C moments) - traffic-equivalent to the exact
    # folded-pair moments a real fast path would use.
    for tag, xx, chf in (("branch W-fold", xw, 2), ("branch HW-fold",
                                                    xhw, 4)):
        mod = BranchBlocks(ch=c * chf)
        ms = time_module(mod, [xx.shape], iters=64)
        print(f"{tag:20s} 4xBasicBlock {ms:7.3f} ms  "
              f"(vs NHWC 3.815 ms unit)", flush=True)


def run_full():
    from bench_model_mfu import build

    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import create_train_state, make_train_step

    model, batch, hw, nc = build("hrnet")
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, hw, hw, 3), BF16))
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.01,
                          train_steps=1000)
    state = create_train_state(model, rng, (batch, hw, hw, 3), tx,
                               input_dtype=BF16)
    step_fn = make_train_step(model.build_loss_fn())
    x = np.random.RandomState(0).rand(batch, hw, hw, 3).astype(np.float32)
    y = np.random.RandomState(1).randint(0, nc, (batch, hw, hw))
    data = {"image": jnp.asarray(x, BF16), "label": jnp.asarray(y, jnp.int32)}
    compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(
        state, data, rng).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", float("nan")))
    for _ in range(3):
        state, parts = step_fn(state, data, rng)
    _ = float(parts["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, parts = step_fn(state, data, rng)
    _ = float(parts["loss"])
    dt = (time.perf_counter() - t0) / 10
    print(json.dumps({"full_ms": round(dt * 1e3, 1),
                      "gflops": round(flops / 1e9, 1),
                      "mfu_pct": round(flops / dt / PEAK * 100, 1)}))


if __name__ == "__main__":
    which = sys.argv[1:] or ["full", "units", "convs", "gemm", "layouts"]
    if "full" in which:
        run_full()
    if "layouts" in which:
        run_layouts()
    if "units" in which:
        run_units()
    if "convs" in which:
        run_convs()
    if "gemm" in which:
        run_gemm()
