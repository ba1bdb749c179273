"""InternImage-T model-level roofline study (VERDICT r4 next #6).

Where do the ~248 ms of the InternImage-T(auto)+ASPP 512^2 b8 train step
go, what is the binding floor of the dense-local DCNv3 stages vs the
MLP/downsample GEMMs, and is the measured img/s the architecture's
ceiling on v5e — following the HRNet study pattern (tools/probe_hrnet.py):
every unit timed IN ISOLATION at its exact training geometry (fwd+bwd,
overhead-calibrated scan harness), then summed against per-unit floors.

Floors:
  * GEMM units (MLP fc1/fc2, in/out projections, downsamples, stem,
    ASPP): max(MXU floor = FLOPs/197e12, HBM floor = bytes/819e9),
    fwd+bwd modeled as 3x fwd FLOPs.
  * dense-local stencil: VPU-arithmetic floor — elementwise-op count of
    the (2*(half+r)+1)^2 = 49-displacement loop (after the round-5
    exact lim fix, was 81) divided by the EMPIRICALLY calibrated VPU
    elementwise rate (the `vpu` section microbenches a pure fused
    multiply-add chain at stage shapes: XLA fusion's attainable ceiling,
    not a paper number).

Sections (any subset as argv): full units floors vpu pallas
Run on TPU: python tools/probe_internimage.py [sections]
"""

import json
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

from iseg_tpu.backbones.intern_image import InternImageBlock  # noqa: E402
from iseg_tpu.nn.dcn import DCNv3  # noqa: E402

PEAK = 197e12
BW = 819e9
BF16 = jnp.bfloat16
B = 8

# InternImage-T stages at 512^2: (H, C, groups, depth)
STAGES = [
    ("stage1", 128, 64, 4, 4),
    ("stage2", 64, 128, 8, 4),
    ("stage3", 32, 256, 16, 18),
    ("stage4", 16, 512, 32, 4),
]
K, R = 3, 2
LIM = (K - 1) // 2 + R          # 3 -> 7x7 = 49 displacements
KK = K * K


class Mlp(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 4, dtype=BF16)(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, dtype=BF16)(h)


def gemm_floor_ms(flops_fwd, bytes_moved):
    """fwd+bwd floor: 3x fwd FLOPs on the MXU vs 3x activation traffic."""
    return max(3 * flops_fwd / PEAK, 3 * bytes_moved / BW) * 1e3


def stencil_elementwise_ops(bg, h, w, gc):
    """Elementwise-op count of deform_dense_local's displacement loop:
    per oy: ty = 2 ops on [BG,H,W,KK]; per (oy,ox): tx 2 ops + m*ty*tx
    2 ops + KK-sum 1 op on [BG,H,W,KK], + accumulate 2 ops on
    [BG,H,W,GC]."""
    ko = 2 * LIM + 1
    per_pix = (ko * 2 * KK                       # ty rows
               + ko * ko * (2 + 2 + 1) * KK      # tx + product + sum
               + ko * ko * 2 * gc)               # out accumulate
    return bg * h * w * per_pix


def section_units():
    print("== units (fwd+bwd ms, isolated at training geometry) ==")
    rows = {}
    total = 0.0
    for name, hw, c, g, depth in STAGES:
        blk = InternImageBlock(dim=c, groups=g, dcn_sampling="dense_local_ref")
        ms_blk = time_module(blk, [(B, hw, hw, c)], dtype=BF16)
        dcn = DCNv3(filters=c, groups=g, sampling="dense_local_ref")
        ms_dcn = time_module(dcn, [(B, hw, hw, c)], dtype=BF16)
        ms_mlp = time_module(Mlp(c), [(B, hw, hw, c)], dtype=BF16,
                             takes_train=False)
        rows[name] = dict(block_ms=ms_blk, dcn_ms=ms_dcn, mlp_ms=ms_mlp,
                          depth=depth, stage_ms=ms_blk * depth)
        total += ms_blk * depth
        print(f"{name}: block {ms_blk:6.2f} ms (dcn {ms_dcn:6.2f}, mlp "
              f"{ms_mlp:5.2f}) x{depth} = {ms_blk * depth:7.1f} ms")
    print(f"sum of stages: {total:.1f} ms")
    return rows


def section_floors(units=None):
    print("== floors (per stage, fwd+bwd) ==")
    out = {}
    vpu_rate = calibrated_vpu_rate()
    total_floor = 0.0
    for name, hw, c, g, depth in STAGES:
        n = B * hw * hw
        gc = c // g
        # GEMMs per block: in-proj C->C, out-proj C->C, offset/mask head
        # C->g*3K^2 (~small), dw 3x3 depthwise, mlp C->4C->C
        gemm_flops = 2 * n * c * c * 2 + 2 * n * c * 4 * c * 2
        gemm_bytes = (6 * n * c) * 2  # in/out of the four big GEMMs, bf16
        f_gemm = gemm_floor_ms(gemm_flops, gemm_bytes)
        el_ops = stencil_elementwise_ops(B * g, hw, hw, gc)
        # bwd of the stencil re-runs comparable elementwise work (~2x fwd)
        f_sten = 3 * el_ops / vpu_rate * 1e3
        floor = (f_gemm + f_sten) * depth
        total_floor += floor
        out[name] = dict(gemm_floor_ms=f_gemm, stencil_floor_ms=f_sten,
                         stage_floor_ms=floor)
        ach = ""
        if units and name in units:
            ach = f"  achieved {units[name]['stage_ms']:.1f} ms " \
                  f"({floor / units[name]['stage_ms'] * 100:.0f}% of floor)"
        print(f"{name}: gemm floor {f_gemm:5.2f} + stencil floor "
              f"{f_sten:5.2f} ms/blk -> stage {floor:7.1f} ms{ach}")
    print(f"sum of stage floors: {total_floor:.1f} ms "
          f"(VPU rate {vpu_rate / 1e12:.2f} Tops/s)")
    return out


_VPU_RATE = None


def calibrated_vpu_rate():
    """Sustained elementwise op rate of an XLA-fused multiply-add chain at
    a stage-3-like shape — the attainable ceiling for stencil math."""
    global _VPU_RATE
    if _VPU_RATE is not None:
        return _VPU_RATE
    shape = (128, 32, 32, 128)
    a = jnp.asarray(np.random.rand(*shape), jnp.float32)
    bb = jnp.asarray(np.random.rand(*shape), jnp.float32)

    reps = 64

    def chain(x):
        acc = x
        for _ in range(reps):
            acc = acc * bb + a  # 2 ops per element per rep
        return acc

    ms = time_grad_fn(chain, a) / 3  # fwd share; grad chain ~2x fwd
    ops = reps * 2 * np.prod(shape)
    _VPU_RATE = ops / (ms / 1e3)
    print(f"[vpu] fused madd chain: {ms:.2f} ms fwd-equiv -> "
          f"{_VPU_RATE / 1e12:.2f} Tops/s sustained")
    return _VPU_RATE


def section_pallas():
    """XLA vs the Pallas dense-local kernel per stage shape (post lim fix)."""
    from iseg_tpu.ops.deform import deform_dense_local
    from iseg_tpu.ops.pallas.deform_local import deform_dense_local_pallas

    print("== dense-local: XLA vs Pallas per stage shape (fwd+bwd ms) ==")
    for name, hw, c, g, depth in STAGES:
        bg, gc = B * g, c // g
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(bg, hw, hw, gc), BF16)
        off = jnp.asarray(rng.uniform(-2, 2, (bg, hw, hw, KK, 2)), jnp.float32)
        mod = jnp.asarray(rng.rand(bg, hw, hw, KK), jnp.float32)
        ms_x = time_grad_fn(
            lambda a, o, m: deform_dense_local(a, o, m, K, R), x, off, mod)
        ms_p = time_grad_fn(
            lambda a, o, m: deform_dense_local_pallas(a, o, m, K, R),
            x, off, mod)
        print(f"{name} [{bg}x{hw}^2x{gc}] x{depth}: xla {ms_x:6.2f}  "
              f"pallas {ms_p:6.2f}  ({ms_x / ms_p:.2f}x)")


def section_full():
    """Full train step via the MFU bench config (for the before/after)."""
    os.system(f"{sys.executable} "
              f"{os.path.join(os.path.dirname(__file__), 'bench_model_mfu.py')}"
              f" intern")


def main():
    sections = sys.argv[1:] or ["units", "floors", "pallas"]
    units = None
    if "units" in sections:
        units = section_units()
    if "vpu" in sections:
        calibrated_vpu_rate()
    if "floors" in sections:
        section_floors(units)
    if "pallas" in sections:
        section_pallas()
    if "full" in sections:
        section_full()


if __name__ == "__main__":
    main()
