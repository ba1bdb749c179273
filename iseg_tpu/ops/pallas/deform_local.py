"""Pallas TPU kernel for gather-free dense-local deformable sampling.

Why a kernel: the XLA formulation of :func:`iseg_tpu.ops.deform.
deform_dense_local` is an 81-term accumulation chain of shifted
multiply-adds. XLA materializes each term through HBM — measured ~8 GB of
traffic for ~90 MB of live data, 0.1-0.3 TF/s sustained, time flat in the
displacement-window size (tools/probe_dense_local.py): pure bandwidth
waste. This kernel keeps the accumulator, the per-tap displacement maps
and the input tile resident in VMEM, so every displacement term is a VPU
multiply-add against on-chip data; HBM sees each tensor once.

Design notes (Mosaic constraints):
- channels-second layout ([C, H, W]) puts W on the 128-lane axis
  (InternImage group channels are 16 — lane-starved in NHWC);
- the horizontal (lane-axis) displacements are HOIsted to the host as
  2*lim+1 pre-shifted copies of the input, so the kernel needs no
  dynamic lane slicing — the displacement loop is a single
  ``fori_loop`` indexing the copy (leading dim) and the row window
  (sublane dim, ``pl.ds``), both Mosaic-supported;
- a fully unrolled 81-step Python loop stack-allocates every
  iteration's temporaries and blows the 16 MB VMEM scoped limit
  (first attempt: 42 MB); ``fori_loop`` keeps one iteration live.

Semantics are EXACTLY :func:`deform_dense_local` (same clamp, same
zero-padding boundary); the public entry point routes gradients through
the XLA implementation's VJP (fwd-speed kernel, reference backward) via
``jax.custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xsh_ref, disp_ref, mod_ref, out_ref, *, lim: int, h: int, w: int,
            c: int, kk: int):
    # xsh_ref: [1, KO, Hp, C, W] — KO = 2*lim+1 lane-pre-shifted copies,
    #          Hp = h + 2*lim (zero-padded rows). Rows sit on an UNTILED
    #          leading dim so the dynamic oy window needs no 8-aligned
    #          sublane slicing (Mosaic constraint); sublane is C.
    # disp_ref:[1, 2*KK, H, W]  (dy taps then dx taps, absolute displacement)
    # mod_ref: [1, KK, H, W]
    # out_ref: [1, H, C, W]
    ko = 2 * lim + 1
    dy = disp_ref[0, :kk]          # [KK, H, W] float32
    dx = disp_ref[0, kk:]
    m = mod_ref[0]

    acc = jnp.zeros((h, c, w), jnp.float32)
    for iy in range(ko):  # static: row windows are free views, and the
        # y-tap weights hoist out of the inner displacement loop
        oy = float(iy - lim)
        tym = jnp.maximum(0.0, 1.0 - jnp.abs(dy - oy)) * m    # [KK, H, W]

        def body(ix, acc, iy=iy, tym=tym):
            ox = (ix - lim).astype(jnp.float32)
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - ox))
            wgt = jnp.sum(tym * tx, axis=0)                   # [H, W]
            # copy ix holds x shifted by ox on the lane axis; rows
            # [iy, iy+h) of the padded tile are the oy-shifted window
            xs = xsh_ref[0, ix, iy:iy + h]                    # [H, C, W]
            return acc + wgt[:, None, :] * xs.astype(jnp.float32)

        acc = jax.lax.fori_loop(0, ko, body, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


def _dense_local_pallas_impl(x, offsets, modulation, kernel_size, max_offset,
                             interpret: bool = False):
    b, h, w, c = x.shape
    k = kernel_size
    kk = k * k
    r = max_offset
    half = (k - 1) // 2
    # tri() is exactly zero beyond half+r (see ops.deform.deform_dense_local)
    lim = half + r
    ko = 2 * lim + 1

    off = jnp.clip(offsets.astype(jnp.float32), -r, r)
    tap = jnp.arange(k, dtype=jnp.float32) - half
    tap_y = jnp.repeat(tap, k)
    tap_x = jnp.tile(tap, k)
    dy = off[..., 0] + tap_y       # [B, H, W, KK]
    dx = off[..., 1] + tap_x
    disp = jnp.concatenate([dy, dx], axis=-1)          # [B, H, W, 2*KK]
    disp = disp.transpose(0, 3, 1, 2)                  # [B, 2*KK, H, W]
    mod = modulation.astype(jnp.float32).transpose(0, 3, 1, 2)

    xt = x.transpose(0, 1, 3, 2)                       # [B, H, C, W]
    xp = jnp.pad(xt, ((0, 0), (lim, lim), (0, 0), (lim, lim)))
    # 2*lim+1 lane-pre-shifted copies: copy ix = columns [ix, ix+w) of the
    # padded tile = x shifted by ox = ix - lim (zeros outside)
    xsh = jnp.stack([xp[..., s:s + w] for s in range(ko)], axis=1)
    # [B, KO, Hp, C, W]

    # channel blocking: keep the (double-buffered) xsh block + the fixed
    # disp/mod/acc footprint under the 16 MB VMEM scoped limit
    hp = h + 2 * lim
    cb = c
    while cb > 1:
        xsh_mb = ko * hp * cb * w * x.dtype.itemsize / 1e6
        fixed_mb = (3 * kk * h * w * 4) / 1e6  # disp + mod, f32
        acc_mb = h * cb * w * 4 / 1e6
        if 2 * xsh_mb + 2 * fixed_mb + 3 * acc_mb + 2.0 < 15.0:
            break
        if cb % 2:
            break
        cb //= 2

    kern = functools.partial(_kernel, lim=lim, h=h, w=w, c=cb, kk=kk)
    out = pl.pallas_call(
        kern,
        grid=(b, c // cb),
        in_specs=[
            pl.BlockSpec((1, ko, hp, cb, w),
                         lambda i, j: (i, 0, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * kk, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, cb, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), x.dtype),
        interpret=interpret,
    )(xsh, disp, mod)
    return out.transpose(0, 1, 3, 2)                   # back to NHWC


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def deform_dense_local_pallas(x, offsets, modulation, kernel_size=3,
                              max_offset=2):
    """Drop-in fast forward for :func:`iseg_tpu.ops.deform.
    deform_dense_local` (identical semantics); backward runs the XLA
    implementation's VJP."""
    return _dense_local_pallas_impl(x, offsets, modulation, kernel_size,
                                    max_offset)


def _fwd(x, offsets, modulation, kernel_size, max_offset):
    out = _dense_local_pallas_impl(x, offsets, modulation, kernel_size,
                                   max_offset)
    return out, (x, offsets, modulation)


def _bwd(kernel_size, max_offset, res, g):
    from iseg_tpu.ops.deform import deform_dense_local

    x, offsets, modulation = res
    _, vjp = jax.vjp(
        lambda xx, oo, mm: deform_dense_local(
            xx, oo, mm, kernel_size=kernel_size, max_offset=max_offset),
        x, offsets, modulation)
    return vjp(g)


deform_dense_local_pallas.defvjp(_fwd, _bwd)
