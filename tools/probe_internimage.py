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
        blk = InternImageBlock(dim=c, groups=g, dcn_sampling="dense_local_ref", dtype=BF16)
        ms_blk = time_module(blk, [(B, hw, hw, c)], dtype=BF16)
        dcn = DCNv3(filters=c, groups=g, sampling="dense_local_ref", dtype=BF16)
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


def section_parts():
    """Time every DCNv3 sub-piece in isolation at stage geometry — the
    module measures ~4x the sum of (sampling op + GEMM floors), so find
    where the balance lives (fwd+bwd ms each)."""
    import flax.linen as nn_
    from iseg_tpu.ops.deform import (
        dcnv3_ref_effective_offsets,
        deform_dense_local,
    )

    for name, hw, c, g, depth in STAGES:
        if name not in ("stage1", "stage3"):
            continue
        gc = c // g
        kk = KK
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(B, hw, hw, c), BF16)
        wv = jnp.asarray(rng.rand(c, c) * 0.05, BF16)
        woff = jnp.asarray(rng.rand(c, 2 * g * kk) * 0.01, BF16)
        off_b = jnp.asarray(rng.uniform(-1, 1, (B * g, hw, hw, kk, 2)),
                            jnp.float32)
        mod_b = jnp.asarray(rng.rand(B * g, hw, hw, kk), jnp.float32)
        vg_arr = jnp.asarray(rng.rand(B * g, hw, hw, gc), BF16)

        rows = {}
        rows["value_proj"] = time_grad_fn(lambda a: a @ wv, x)
        dw = nn_.Conv(c, (K, K), feature_group_count=c, padding="SAME",
                      dtype=BF16)
        rows["dw_conv"] = time_module(dw, [(B, hw, hw, c)], dtype=BF16,
                                      takes_train=False)
        ln = nn_.LayerNorm(epsilon=1e-6, dtype=BF16)
        rows["layernorm"] = time_module(ln, [(B, hw, hw, c)], dtype=BF16,
                                        takes_train=False)
        rows["gelu"] = time_grad_fn(
            lambda a: nn_.gelu(a, approximate=False), x)
        rows["offset_head"] = time_grad_fn(lambda a: a @ woff, x)
        rows["softmax"] = time_grad_fn(
            lambda a: jax.nn.softmax(
                a.reshape(B, hw, hw, g, kk).astype(jnp.float32), axis=-1),
            jnp.asarray(rng.rand(B, hw, hw, g * kk), BF16))
        rows["group_fold"] = time_grad_fn(
            lambda a: a.reshape(B, hw, hw, g, gc)
            .transpose(0, 3, 1, 2, 4).reshape(B * g, hw, hw, gc), x)
        rows["plane_T"] = time_grad_fn(
            lambda a: a.transpose(0, 2, 1, 3), vg_arr)
        rows["eff_off"] = time_grad_fn(
            lambda o: dcnv3_ref_effective_offsets(o, hw, hw, K), off_b)
        rows["sample_op"] = time_grad_fn(
            lambda a, o, m: deform_dense_local(a, o, m, K, R),
            vg_arr, off_b, mod_b)
        # the composition the module actually runs: eff offsets -> clamp ->
        # dense local on the transposed plane, differentiated end to end
        rows["eff+sample"] = time_grad_fn(
            lambda a, o, m: deform_dense_local(
                a.transpose(0, 2, 1, 3),
                dcnv3_ref_effective_offsets(o, hw, hw, K), m, K, R),
            vg_arr, off_b, mod_b)
        rows["unfold"] = time_grad_fn(
            lambda a: a.reshape(B, g, hw, hw, gc)
            .transpose(0, 2, 3, 1, 4).reshape(B, hw, hw, c), vg_arr)
        total = sum(v for k, v in rows.items() if k != "eff+sample")
        print(f"-- {name} [{B}x{hw}^2x{c} g{g}] --")
        for k, v in rows.items():
            print(f"  {k:12s} {v:7.3f} ms")
        print(f"  sum(parts)   {total:7.3f} ms (module measured: see units)")


def section_cliff():
    """Bisect the module-vs-parts cliff: build the DCNv3 forward as a pure
    function, adding one ingredient at a time, and find which composition
    step blows the compiled cost up (fwd+bwd ms, stage3 + stage1)."""
    from iseg_tpu.ops.deform import (
        dcnv3_ref_effective_offsets,
        deform_dense_local,
    )

    for name, hw, c, g, depth in STAGES:
        if name not in ("stage1", "stage3"):
            continue
        gc = c // g
        kk = KK
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(B, hw, hw, c), BF16)
        wv = jnp.asarray(rng.rand(c, c) * 0.05, BF16)
        wo_ = jnp.asarray(rng.rand(c, c) * 0.05, BF16)
        woff = jnp.asarray(rng.rand(c, 2 * g * kk) * 0.01, BF16)
        wmask = jnp.asarray(rng.rand(c, g * kk) * 0.01, BF16)
        off_raw = jnp.asarray(rng.uniform(-1, 1, (B, hw, hw, 2 * g * kk)),
                              BF16)
        mask_raw = jnp.asarray(rng.rand(B, hw, hw, g * kk), BF16)

        def fold_off(offsets):
            o = offsets.reshape(B, hw, hw, g, kk, 2)
            return o.transpose(0, 3, 1, 2, 4, 5).reshape(
                B * g, hw, hw, kk, 2)

        def fold_mask(mask):
            mm = jax.nn.softmax(
                mask.reshape(B, hw, hw, g, kk).astype(jnp.float32), axis=-1
            ).astype(BF16)
            return mm.transpose(0, 3, 1, 2, 4).reshape(B * g, hw, hw, kk)

        def fold_v(v):
            return v.reshape(B, hw, hw, g, gc).transpose(
                0, 3, 1, 2, 4).reshape(B * g, hw, hw, gc)

        def sample(vg, off_b, mod_b):
            eff = dcnv3_ref_effective_offsets(off_b, hw, hw, K)
            return deform_dense_local(
                vg.transpose(0, 2, 1, 3), eff, mod_b, K, R)

        def unfold(out):
            return out.reshape(B, g, hw, hw, gc).transpose(
                0, 2, 3, 1, 4).reshape(B, hw, hw, c)

        # (a) sampling with pre-folded leaf inputs (the parts baseline)
        a = time_grad_fn(
            sample,
            jnp.asarray(rng.rand(B * g, hw, hw, gc), BF16),
            jnp.asarray(rng.uniform(-1, 1, (B * g, hw, hw, kk, 2)),
                        jnp.float32),
            jnp.asarray(rng.rand(B * g, hw, hw, kk), jnp.float32))
        # (b) + bf16 offsets/mask leaves (module dtypes)
        b = time_grad_fn(
            sample,
            jnp.asarray(rng.rand(B * g, hw, hw, gc), BF16),
            jnp.asarray(rng.uniform(-1, 1, (B * g, hw, hw, kk, 2)), BF16),
            jnp.asarray(rng.rand(B * g, hw, hw, kk), BF16))
        # (c) + the fold transposes from model-layout leaves
        cfn = lambda v, offs, mask: unfold(
            sample(fold_v(v), fold_off(offs), fold_mask(mask)))
        cms = time_grad_fn(cfn, jnp.asarray(rng.rand(B, hw, hw, c), BF16),
                           off_raw, mask_raw)
        # (d) + offsets/mask produced by GEMMs from a shared feature
        def dfn(v, feat):
            offs = feat @ woff
            mask = feat @ wmask
            return unfold(sample(fold_v(v), fold_off(offs), fold_mask(mask)))
        dms = time_grad_fn(dfn, jnp.asarray(rng.rand(B, hw, hw, c), BF16),
                           jnp.asarray(rng.rand(B, hw, hw, c), BF16))
        # (e) full module math: value proj + shared feature -> heads ->
        # sample -> out proj (flax-free replica of DCNv3.__call__)
        def efn(xx):
            v = xx @ wv
            feat = nn.gelu(xx, approximate=False)  # stand-in for dw+LN+gelu
            offs = feat @ woff
            mask = feat @ wmask
            out = unfold(
                sample(fold_v(v), fold_off(offs), fold_mask(mask)))
            return out @ wo_
        ems = time_grad_fn(efn, x)

        # (f) = (c) with an optimization_barrier between the folds and the
        # displacement loop: force the relayout to materialize ONCE instead
        # of being re-fused into every shifted read
        def ffn(v, offs, mask):
            vg, off_b, mod_b = jax.lax.optimization_barrier(
                (fold_v(v), fold_off(offs), fold_mask(mask)))
            out = jax.lax.optimization_barrier(sample(vg, off_b, mod_b))
            return unfold(out)
        fms = time_grad_fn(ffn, jnp.asarray(rng.rand(B, hw, hw, c), BF16),
                           off_raw, mask_raw)

        # (g) = (e) with the same barriers
        def gfn(xx):
            v = xx @ wv
            feat = nn.gelu(xx, approximate=False)
            offs = feat @ woff
            mask = feat @ wmask
            vg, off_b, mod_b = jax.lax.optimization_barrier(
                (fold_v(v), fold_off(offs), fold_mask(mask)))
            out = jax.lax.optimization_barrier(sample(vg, off_b, mod_b))
            return unfold(out) @ wo_
        gms = time_grad_fn(gfn, x)
        print(f"-- {name} [{B}x{hw}^2x{c} g{g}] --")
        print(f"  a sampling leaves-f32      {a:7.3f} ms")
        print(f"  b sampling leaves-bf16     {b:7.3f} ms")
        print(f"  c + fold transposes        {cms:7.3f} ms")
        print(f"  d + head GEMMs             {dms:7.3f} ms")
        print(f"  e full module math         {ems:7.3f} ms")
        print(f"  f (c) + barriers           {fms:7.3f} ms")
        print(f"  g (e) + barriers           {gms:7.3f} ms")

        # (h) barriers at EVERY layout boundary: after the GEMMs, after the
        # folds, after the sampling, after the unfold
        def hfn(xx):
            v = xx @ wv
            feat = nn.gelu(xx, approximate=False)
            offs = feat @ woff
            mask = feat @ wmask
            v, offs, mask = jax.lax.optimization_barrier((v, offs, mask))
            vg, off_b, mod_b = jax.lax.optimization_barrier(
                (fold_v(v), fold_off(offs), fold_mask(mask)))
            out = jax.lax.optimization_barrier(sample(vg, off_b, mod_b))
            out = jax.lax.optimization_barrier(unfold(out))
            return out @ wo_
        hms = time_grad_fn(hfn, x)

        # (i) like (g) but WITHOUT the output projection — is the
        # unfold->GEMM boundary the remaining cost?
        def ifn(xx):
            v = xx @ wv
            feat = nn.gelu(xx, approximate=False)
            offs = feat @ woff
            mask = feat @ wmask
            vg, off_b, mod_b = jax.lax.optimization_barrier(
                (fold_v(v), fold_off(offs), fold_mask(mask)))
            out = jax.lax.optimization_barrier(sample(vg, off_b, mod_b))
            return unfold(out)
        ims = time_grad_fn(ifn, x)
        print(f"  h per-boundary barriers    {hms:7.3f} ms")
        print(f"  i (g) minus out-proj       {ims:7.3f} ms")


def section_flaxbi():
    """Bisect flax-module cost vs the pure replica: fwd-only, fwd+input-
    grads (params constant), and fwd+param+input grads (training reality)."""
    from probe_util import time_fn

    for name, hw, c, g, depth in STAGES:
        if name not in ("stage1", "stage3"):
            continue
        dcn = DCNv3(filters=c, groups=g, sampling="dense_local_ref", dtype=BF16)
        x = jnp.asarray(np.random.RandomState(0).rand(B, hw, hw, c), BF16)
        variables = dcn.init(jax.random.PRNGKey(0), x)

        fwd = time_fn(lambda a: dcn.apply(variables, a), x)
        full = time_module(dcn, [(B, hw, hw, c)], dtype=BF16)
        dcn_nf = DCNv3(filters=c, groups=g, sampling="dense_local_ref",
                       fusion_barriers=False, dtype=BF16)
        fwd_nf = time_fn(lambda a: dcn_nf.apply(variables, a), x)
        full_nf = time_module(dcn_nf, [(B, hw, hw, c)], dtype=BF16)
        print(f"{name}: fenced fwd {fwd:6.2f} full {full:6.2f} | "
              f"unfenced fwd {fwd_nf:6.2f} full {full_nf:6.2f} ms")


def section_exact():
    """FWD-ONLY bisect of the flax DCNv3 against exact pure replicas:
    swap one ingredient at a time (dw+LN chain, zero offsets) to find
    what makes the flax forward ~4x the pure-math forward."""
    from probe_util import time_fn
    from iseg_tpu.ops.deform import (
        dcnv3_ref_effective_offsets,
        deform_dense_local,
    )

    for name, hw, c, g, depth in STAGES:
        if name not in ("stage1", "stage3"):
            continue
        gc = c // g
        kk = KK
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(B, hw, hw, c), BF16)
        wv = jnp.asarray(rng.rand(c, c) * 0.05, BF16)
        wo_ = jnp.asarray(rng.rand(c, c) * 0.05, BF16)
        wdw = jnp.asarray(rng.rand(K, K, 1, c) * 0.1, BF16)
        ln_g = jnp.ones((c,), jnp.float32)
        ln_b = jnp.zeros((c,), jnp.float32)
        woff = jnp.asarray(rng.rand(c, 2 * g * kk) * 0.01, BF16)
        wmask = jnp.asarray(rng.rand(c, g * kk) * 0.01, BF16)

        def folds_and_sample(v, offs, mask):
            o = offs.reshape(B, hw, hw, g, kk, 2)
            off_b = o.transpose(0, 3, 1, 2, 4, 5).reshape(
                B * g, hw, hw, kk, 2)
            mm = jax.nn.softmax(
                mask.reshape(B, hw, hw, g, kk).astype(jnp.float32), axis=-1
            ).astype(BF16)
            mod_b = mm.transpose(0, 3, 1, 2, 4).reshape(B * g, hw, hw, kk)
            vg = v.reshape(B, hw, hw, g, gc).transpose(
                0, 3, 1, 2, 4).reshape(B * g, hw, hw, gc)
            vg, off_b, mod_b = jax.lax.optimization_barrier(
                (vg, off_b, mod_b))
            eff = dcnv3_ref_effective_offsets(off_b, hw, hw, K)
            out = deform_dense_local(
                vg.transpose(0, 2, 1, 3), eff, mod_b, K, R)
            out = jax.lax.optimization_barrier(out)
            return out.reshape(B, g, hw, hw, gc).transpose(
                0, 2, 3, 1, 4).reshape(B, hw, hw, c)

        def dw_ln_gelu(xx):
            f = jax.lax.conv_general_dilated(
                xx, wdw, (1, 1), "SAME", feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            f32 = f.astype(jnp.float32)
            mu = f32.mean(-1, keepdims=True)
            var = ((f32 - mu) ** 2).mean(-1, keepdims=True)
            f = ((f32 - mu) / jnp.sqrt(var + 1e-6) * ln_g + ln_b).astype(BF16)
            return nn.gelu(f, approximate=False)

        # replica with gelu-only feature (known-fast baseline)
        r0 = time_fn(lambda xx: folds_and_sample(
            xx @ wv, nn.gelu(xx, approximate=False) @ woff,
            nn.gelu(xx, approximate=False) @ wmask) @ wo_, x)
        # + exact dw+LN+gelu feature chain
        r1 = time_fn(lambda xx: (lambda feat: folds_and_sample(
            xx @ wv, feat @ woff, feat @ wmask) @ wo_)(dw_ln_gelu(xx)), x)
        # + ZERO offset head (the real module's init state)
        r2 = time_fn(lambda xx: (lambda feat: folds_and_sample(
            xx @ wv, feat @ (woff * 0.0), feat @ wmask) @ wo_)(
                dw_ln_gelu(xx)), x)
        # the flax module forward itself
        dcn = DCNv3(filters=c, groups=g, sampling="dense_local_ref")
        variables = dcn.init(jax.random.PRNGKey(0), x)
        r3 = time_fn(lambda a: dcn.apply(variables, a), x)
        print(f"{name}: replica {r0:6.2f}  +dwLN {r1:6.2f}  "
              f"+zeroOff {r2:6.2f}  flax {r3:6.2f} ms (fwd only)")


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
    if "parts" in sections:
        section_parts()
    if "cliff" in sections:
        section_cliff()
    if "flaxbi" in sections:
        section_flaxbi()
    if "exact" in sections:
        section_exact()
    if "full" in sections:
        section_full()


if __name__ == "__main__":
    main()
