"""Deformable-convolution sampling core: batched bilinear gather.

Parity with the reference's pure-TF bilinear samplers
(``layers/dcn_v2.py:121`` ``_forward``, ``layers/dcn_v3/utils.py:65,110``)
which it XLA-jits (``layers/dcn_v3/op.py:11-16``).

TPU-first design: instead of per-tap scalar sampling, all K*K taps are
gathered at once into an im2col layout [N, H, W, K*K, C]; the deformable
conv then reduces over (K*K, C) with a plain matmul — the gather is the
only irregular op and the FLOPs land on the MXU. The gather itself is four
``take_along_axis`` ops over flattened spatial indices, which XLA lowers to
TPU dynamic-gather. A Pallas double-buffered variant can slot in behind the
same signature (``iseg_tpu.ops.pallas``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bilinear_gather(x: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample ``x`` [N, H, W, C] at float ``coords`` [N, P, 2] (y, x order,
    pixel units). Out-of-bounds samples contribute zero, matching the
    reference's zero-padding semantics (``dcn_v2.py:121-175``).

    Returns [N, P, C].
    """
    n, h, w, c = x.shape
    y = coords[..., 0].astype(jnp.float32)
    xf = coords[..., 1].astype(jnp.float32)

    y0 = jnp.floor(y)
    x0 = jnp.floor(xf)
    ty = y - y0
    tx = xf - x0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat_idx = yc * w + xc  # [N, P]
        flat = x.reshape(n, h * w, c)
        out = jnp.take_along_axis(flat, flat_idx[..., None], axis=1)
        return out * valid[..., None].astype(x.dtype)

    w00 = ((1 - ty) * (1 - tx))[..., None].astype(x.dtype)
    w01 = ((1 - ty) * tx)[..., None].astype(x.dtype)
    w10 = (ty * (1 - tx))[..., None].astype(x.dtype)
    w11 = (ty * tx)[..., None].astype(x.dtype)

    return (
        gather(y0, x0) * w00
        + gather(y0, x0 + 1) * w01
        + gather(y0 + 1, x0) * w10
        + gather(y0 + 1, x0 + 1) * w11
    )


def deform_dense_local(
    x: jax.Array,
    offsets: jax.Array,
    modulation: jax.Array,
    kernel_size: int = 3,
    max_offset: int = 2,
) -> jax.Array:
    """Gather-free deformable sampling for bounded offsets (TPU fast path).

    TPU gathers run ~100x slower than dense math (measured: one DCNv3 layer
    276 ms vs ~2 ms for a same-size conv). With offsets clamped to
    ``[-max_offset, max_offset]``, the modulated bilinear sample decomposes
    exactly into a weighted sum over the fixed (K + 2*max_offset + ...)
    neighborhood:

        out[p] = sum_o w_o[p] * x[p + o],
        w_o[p] = sum_k m_k[p] * tri(tap_k + d_k[p] - o)

    where ``tri(t) = max(0, 1 - |t|)`` is the bilinear hat function and the
    sum over integer displacements ``o`` runs a static double loop of
    shifted arrays — pure VPU multiply-accumulates, no gather anywhere.
    Exactly equal to the gather path whenever |offset| <= max_offset
    (zero-padding boundary semantics match).

    Args:
      x: [B, H, W, C].
      offsets: [B, H, W, K*K, 2] (dy, dx); clamped to +-max_offset.
      modulation: [B, H, W, K*K] per-tap weights.
    Returns [B, H, W, C]. Stride/dilation 1 only.
    """
    b, h, w, c = x.shape
    k = kernel_size
    kk = k * k
    r = max_offset
    half = (k - 1) // 2
    # Displacement support: |tap + clamped_offset| <= half + r, and the
    # bilinear hat tri(t) = max(0, 1-|t|) is EXACTLY zero at |t| >= 1, so
    # o = +-(half+r+1) can never receive weight (tri((half+r) - (half+r+1))
    # = tri(-1) = 0 even at the clamp extreme). lim = half + r is
    # bit-exact and shrinks the displacement loop (2*lim+1)^2 from 81 to
    # 49 terms at the default K=3, r=2 — verified 0.0 max-abs diff vs the
    # old half+r+1 loop including integer-extreme offsets (round 5).
    lim = half + r

    off = jnp.clip(offsets.astype(jnp.float32), -r, r)
    tap = (jnp.arange(k, dtype=jnp.float32) - half)
    tap_y = jnp.repeat(tap, k)   # [K*K]
    tap_x = jnp.tile(tap, k)
    # absolute fractional displacement per tap: [B, H, W, K*K]
    dy = off[..., 0] + tap_y
    dx = off[..., 1] + tap_x
    m = modulation.astype(jnp.float32)

    def shift(arr, oy, ox):
        pads = [(0, 0), (max(oy, 0), max(-oy, 0)), (max(ox, 0), max(-ox, 0))]
        if arr.ndim == 4:
            pads = pads + [(0, 0)]
        padded = jnp.pad(arr, pads)
        ys = max(-oy, 0)
        xs = max(-ox, 0)
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(padded, ys, ys + h, axis=1), xs, xs + w, axis=2
        )

    out = jnp.zeros((b, h, w, c), jnp.float32)
    for oy in range(-lim, lim + 1):
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(dy - oy))  # [B,H,W,KK]
        for ox in range(-lim, lim + 1):
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - ox))
            w_o = jnp.sum(m * ty * tx, axis=-1)  # [B,H,W]
            # x[p + o] -> shift by -o
            out = out + w_o[..., None] * shift(x, -oy, -ox).astype(jnp.float32)
    return out.astype(x.dtype)


def _dense_local_flat_math(x, off_dy, off_dx, modulation, groups,
                           kernel_size, max_offset):
    """Grouped dense-local sampling WITHOUT the group-fold relayout.

    Same math as :func:`deform_dense_local` vmapped over G groups, but the
    values stay ``[B, H, W, G*gc]`` (group-major channels) end to end and
    every loop operand keeps a LARGE minor dim:

    * the group-fold transposes of the [B*G, ...] formulation are never
      materialized by XLA — layout assignment defers them INTO the
      49-term displacement loop, so every shifted read pays the relayout
      (measured v5e, tools/probe_internimage.py: the stage-3 DCNv3 module
      ran 15x its parts sum; the entry HLO shows 49 materialized
      per-iteration broadcasts, 5.1 GB accessed vs 1.1 for the same math
      on leaf inputs);
    * displacement maps ride FLAT as [B, H, W, G*KK] — a [.., G, KK]
      layout pads KK=9 up to the 128-lane tile (14x memory blowup, OOM
      at 512^2 b8);
    * the per-group weight reduce and the group->channel broadcast are a
      reshape-reduce + repeat INSIDE the loop fusion (tiny [.., G, KK]
      views never materialize, so their sub-tile minor dims never pad);
      a constant block-diagonal matmul was tried and is 4x SLOWER — a
      dot_general cannot fuse into elementwise fusions, so each of the 49
      iterations became its own materialization island.

    Args:
      x: [B, H, W, G*gc] (group-major: channel = g*gc + j).
      off_dy/off_dx: [B, H, W, G*KK] per-tap (dy, dx) offsets, flattened
        group-major (j = g*KK + tap); clamped to +-max_offset.
      modulation: [B, H, W, G*KK] per-tap weights, same flattening.
    Returns [B, H, W, G*gc]. Stride/dilation 1 only.
    """
    import numpy as np

    b, h, w, c = x.shape
    g = groups
    gc = c // g
    k = kernel_size
    kk = k * k
    r = max_offset
    half = (k - 1) // 2
    lim = half + r  # tri() support bound; see deform_dense_local

    tap = (np.arange(k, dtype=np.float32) - half)
    tap_y = jnp.asarray(np.tile(np.repeat(tap, k), g))   # [G*KK]
    tap_x = jnp.asarray(np.tile(np.tile(tap, k), g))
    dy = jnp.clip(off_dy.astype(jnp.float32), -r, r) + tap_y
    dx = jnp.clip(off_dx.astype(jnp.float32), -r, r) + tap_x
    m = modulation.astype(jnp.float32)

    def shift(arr, oy, ox):
        pads = [(0, 0), (max(oy, 0), max(-oy, 0)),
                (max(ox, 0), max(-ox, 0)), (0, 0)]
        padded = jnp.pad(arr, pads)
        ys = max(-oy, 0)
        xs = max(-ox, 0)
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(padded, ys, ys + h, axis=1), xs, xs + w,
            axis=2)

    # the group reduce (sum over the KK sub-axis) and the group->channel
    # expand are a fused reshape-reduce + repeat — NOT a matmul: a
    # dot_general cannot fuse into elementwise fusions, so a dot here
    # splits the loop into 49 materialization islands (measured: 4x the
    # fused cost). The [.., G, KK]/[.., G] views live only INSIDE the
    # fusion, so their tiny minor dims never hit the tiled layout.
    out = jnp.zeros((b, h, w, c), jnp.float32)
    for oy in range(-lim, lim + 1):
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(dy - oy))   # [B,H,W,G*KK]
        for ox in range(-lim, lim + 1):
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - ox))
            t = m * ty * tx
            w_o = jnp.sum(t.reshape(b, h, w, g, kk), axis=-1)  # [B,H,W,G]
            wexp = jnp.repeat(w_o, gc, axis=-1)                # [B,H,W,C]
            out = out + wexp * shift(x, -oy, -ox).astype(jnp.float32)
    return out.astype(x.dtype)


def _flat_consts(groups, kernel_size, c):
    """(tap_y, tap_x, expand) constants for the flat formulation."""
    import numpy as np

    g, k = groups, kernel_size
    kk = k * k
    gc = c // g
    half = (k - 1) // 2
    tap = (np.arange(k, dtype=np.float32) - half)
    tap_y = jnp.asarray(np.tile(np.repeat(tap, k), g))
    tap_x = jnp.asarray(np.tile(np.tile(tap, k), g))
    expand = np.zeros((g * kk, c), np.float32)
    for gi in range(g):
        expand[gi * kk:(gi + 1) * kk, gi * gc:(gi + 1) * gc] = 1.0
    return tap_y, tap_x, jnp.asarray(expand)


def _shift4(arr, oy, ox, h, w):
    pads = [(0, 0), (max(oy, 0), max(-oy, 0)),
            (max(ox, 0), max(-ox, 0)), (0, 0)]
    padded = jnp.pad(arr, pads)
    ys = max(-oy, 0)
    xs = max(-ox, 0)
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(padded, ys, ys + h, axis=1), xs, xs + w, axis=2)


def _dense_local_flat_bwd_math(x, off_dy, off_dx, modulation, groups,
                               kernel_size, max_offset, g_out):
    """Hand-written VJP of :func:`_dense_local_flat_math` that RECOMPUTES
    the displacement weights instead of letting autodiff store them: the
    naive vjp saves every iteration's ``wexp``/shifted-x pair (49 x
    [B,H,W,C] f32 per layer — the forward-under-vjp becomes a memory-bound
    store pass, measured 4x the pure forward, and OOMs InternImage-T at
    512^2 b8). Residuals here are just the four inputs; the backward runs
    the same fused 49-term loop shape as the forward (flash-attention
    recompute pattern)."""
    b, h, w, c = x.shape
    g = groups
    gc = c // g
    k = kernel_size
    kk = k * k
    r = max_offset
    half = (k - 1) // 2
    lim = half + r
    tap_y, tap_x, _ = _flat_consts(groups, k, c)

    ody = off_dy.astype(jnp.float32)
    odx = off_dx.astype(jnp.float32)
    dy = jnp.clip(ody, -r, r) + tap_y
    dx = jnp.clip(odx, -r, r) + tap_x
    m = modulation.astype(jnp.float32)
    gf = g_out.astype(jnp.float32)
    xf = x.astype(jnp.float32)

    d_x = jnp.zeros((b, h, w, c), jnp.float32)
    d_dy = jnp.zeros(dy.shape, jnp.float32)
    d_dx = jnp.zeros(dx.shape, jnp.float32)
    d_m = jnp.zeros(m.shape, jnp.float32)
    for oy in range(-lim, lim + 1):
        uy = dy - oy
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(uy))
        dty = jnp.where(jnp.abs(uy) < 1.0, -jnp.sign(uy), 0.0)
        for ox in range(-lim, lim + 1):
            ux = dx - ox
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(ux))
            t = m * ty * tx
            # group reduce + expand as fused reshape-reduce/repeat, NOT a
            # matmul (a dot splits the loop into materialization islands
            # — see _dense_local_flat_math)
            w_o = jnp.sum(t.reshape(b, h, w, g, kk), axis=-1)  # [B,H,W,G]
            wexp = jnp.repeat(w_o, gc, axis=-1)                # [B,H,W,C]
            xs = _shift4(xf, -oy, -ox, h, w)
            # dX[q] += (wexp * g)[q - o]
            d_x = d_x + _shift4(wexp * gf, oy, ox, h, w)
            # d_t[p, j] = per-group channel-sum of g*xs, replicated to taps
            s_g = jnp.sum((gf * xs).reshape(b, h, w, g, gc), axis=-1)
            d_t = jnp.repeat(s_g, kk, axis=-1)                 # [B,H,W,GKK]
            d_m = d_m + d_t * ty * tx
            d_dy = d_dy + d_t * m * tx * dty
            dtx = jnp.where(jnp.abs(ux) < 1.0, -jnp.sign(ux), 0.0)
            d_dx = d_dx + d_t * m * ty * dtx
    # clip passes gradient only inside the (inclusive) clamp window
    d_ody = jnp.where((ody >= -r) & (ody <= r), d_dy, 0.0)
    d_odx = jnp.where((odx >= -r) & (odx <= r), d_dx, 0.0)
    return (d_x.astype(x.dtype), d_ody.astype(off_dy.dtype),
            d_odx.astype(off_dx.dtype), d_m.astype(modulation.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def dense_local_flat(x, off_dy, off_dx, modulation, groups,
                     kernel_size=3, max_offset=2):
    """Public flat grouped dense-local sampling; see
    :func:`_dense_local_flat_math` for the layout rationale. The custom
    VJP recomputes the loop in backward (residuals = inputs only)."""
    return _dense_local_flat_math(x, off_dy, off_dx, modulation, groups,
                                  kernel_size, max_offset)


def _dlf_fwd(x, off_dy, off_dx, modulation, groups, kernel_size, max_offset):
    out = _dense_local_flat_math(x, off_dy, off_dx, modulation, groups,
                                 kernel_size, max_offset)
    return out, (x, off_dy, off_dx, modulation)


def _dlf_bwd(groups, kernel_size, max_offset, res, g_out):
    x, off_dy, off_dx, modulation = res
    # fence the backward's boundary: leaf-like inputs restore the fused
    # single-pass lowering of the recompute loop (the same loop composed
    # into the surrounding bwd graph de-fuses, see _dense_local_flat_math)
    x, off_dy, off_dx, modulation, g_out = jax.lax.optimization_barrier(
        (x, off_dy, off_dx, modulation, g_out))
    grads = _dense_local_flat_bwd_math(
        x, off_dy, off_dx, modulation, groups, kernel_size, max_offset,
        g_out)
    return jax.lax.optimization_barrier(grads)


dense_local_flat.defvjp(_dlf_fwd, _dlf_bwd)


def deform_dense_local_grouped(
    x: jax.Array,
    offsets: jax.Array,
    modulation: jax.Array,
    kernel_size: int = 3,
    max_offset: int = 2,
) -> jax.Array:
    """Convenience wrapper over :func:`dense_local_flat` taking the
    module-layout tensors: offsets [B, H, W, G, K*K, 2] (dy, dx),
    modulation [B, H, W, G, K*K]. The minor-dim flattening happens once,
    outside the displacement loop."""
    b, h, w, _ = x.shape
    g = offsets.shape[3]
    kk = offsets.shape[4]
    off_dy = offsets[..., 0].reshape(b, h, w, g * kk)
    off_dx = offsets[..., 1].reshape(b, h, w, g * kk)
    m = modulation.reshape(b, h, w, g * kk)
    return dense_local_flat(x, off_dy, off_dx, m, g, kernel_size,
                            max_offset)


def dcnv3_ref_effective_offsets_grouped(
    offsets: jax.Array,
    h: int,
    w: int,
    kernel_size: int = 3,
    offset_scale: float = 1.0,
):
    """Grouped-flat variant of :func:`dcnv3_ref_effective_offsets` for
    :func:`dense_local_flat`: offsets [B, Ho, Wo, G, P, 2] ->
    (eff_dy, eff_dx), each [B, Ho, Wo, G*P] (group-major j = g*P + tap).
    Identical math (the group axis rides along; position terms broadcast
    over it); flat-minor so nothing downstream carries a tiny tiled dim."""
    import numpy as np

    if h != w:
        raise ValueError(
            f"dense-local reference semantics needs a square map, got {h}x{w}")
    k = kernel_size
    kk = k * k
    pad = (k - 1) // 2
    hp = h + 2 * pad
    f32 = jnp.float32

    b = offsets.shape[0]
    g = offsets.shape[3]
    half = (k - 1) // 2
    taps = np.arange(k, dtype=np.float32) - half
    tap_y_dense = jnp.asarray(np.tile(np.repeat(taps, k), g))   # [G*P]
    tap_x_dense = jnp.asarray(np.tile(np.tile(taps, k), g))
    base = -((k - 1) // 2)
    ref_dx = jnp.asarray(np.tile(
        base + np.repeat(np.arange(k, dtype=np.float32), k), g))  # [G*P]
    ref_dy = jnp.asarray(np.tile(
        base + np.tile(np.arange(k, dtype=np.float32), k), g))

    i = jnp.arange(h, dtype=f32)[:, None]   # [Ho, 1]
    j = jnp.arange(w, dtype=f32)[:, None]
    off0 = offsets[..., 0].reshape(b, h, w, g * kk).astype(f32)
    off1 = offsets[..., 1].reshape(b, h, w, g * kk).astype(f32)

    sq = (hp - 2.0) / hp
    x_base = (pad + 0.5 + i) * sq - pad + ref_dx * offset_scale * sq  # [Ho,GP]
    y_base = (pad + 0.5 + j) * sq - pad + ref_dy * offset_scale * sq  # [Wo,GP]
    x_t = x_base[None, :, None, :] + off0 * offset_scale * sq
    y_t = y_base[None, None, :, :] + off1 * offset_scale * sq

    eff_dy = x_t - (i[None, :, None] + tap_y_dense)
    eff_dx = y_t - (jnp.arange(w, dtype=f32)[None, None, :, None]
                    + tap_x_dense)
    return eff_dy, eff_dx


def deform_dense_local_taps(
    x: jax.Array,
    offsets: jax.Array,
    kernel_size: int = 3,
    max_offset: int = 2,
) -> jax.Array:
    """Gather-free variant of :func:`deform_im2col` for bounded offsets:
    returns the per-tap samples [B, H, W, K*K, C] as sums of shifted dense
    reads (for DCNv2-style per-tap weight matrices). Exact vs the gather
    path whenever |offset| <= max_offset. Stride/dilation 1 only."""
    b, h, w, c = x.shape
    k = kernel_size
    kk = k * k
    r = max_offset
    half = (k - 1) // 2
    lim = half + r  # tri() is exactly 0 beyond this; see deform_dense_local

    off = jnp.clip(offsets.astype(jnp.float32), -r, r)
    tap = (jnp.arange(k, dtype=jnp.float32) - half)
    tap_y = jnp.repeat(tap, k)
    tap_x = jnp.tile(tap, k)
    dy = off[..., 0] + tap_y  # [B,H,W,KK]
    dx = off[..., 1] + tap_x

    def shift(arr, oy, ox):
        pads = [(0, 0), (max(oy, 0), max(-oy, 0)),
                (max(ox, 0), max(-ox, 0)), (0, 0)]
        padded = jnp.pad(arr, pads)
        ys = max(-oy, 0)
        xs = max(-ox, 0)
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(padded, ys, ys + h, axis=1), xs, xs + w, axis=2
        )

    out = jnp.zeros((b, h, w, kk, c), jnp.float32)
    for oy in range(-lim, lim + 1):
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(dy - oy))
        for ox in range(-lim, lim + 1):
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - ox))
            w_o = ty * tx  # [B,H,W,KK]
            out = out + w_o[..., None] * shift(x, -oy, -ox)[:, :, :, None, :].astype(jnp.float32)
    return out.astype(x.dtype)


def deform_im2col(
    x: jax.Array,
    offsets: jax.Array,
    kernel_size: int = 3,
    stride: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """Gather the K*K deformed taps for every output position.

    Args:
      x: [N, H, W, C] input.
      offsets: [N, Ho, Wo, K*K, 2] (dy, dx) learned offsets.
    Returns: [N, Ho, Wo, K*K, C] sampled taps (im2col layout).
    """
    n, h, w, c = x.shape
    k = kernel_size
    ho = (h - 1) // stride + 1
    wo = (w - 1) // stride + 1

    # base sampling grid: output centers + kernel tap offsets
    ys = jnp.arange(ho, dtype=jnp.float32) * stride
    xs = jnp.arange(wo, dtype=jnp.float32) * stride
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")  # [Ho, Wo]

    half = (k - 1) / 2.0
    tap = (jnp.arange(k, dtype=jnp.float32) - half) * dilation
    tap_y, tap_x = jnp.meshgrid(tap, tap, indexing="ij")  # [K, K]
    tap_y = tap_y.reshape(-1)
    tap_x = tap_x.reshape(-1)

    base_y = grid_y[None, :, :, None] + tap_y[None, None, None, :]
    base_x = grid_x[None, :, :, None] + tap_x[None, None, None, :]
    coords = jnp.stack(
        [
            base_y + offsets[..., 0].astype(jnp.float32),
            base_x + offsets[..., 1].astype(jnp.float32),
        ],
        axis=-1,
    )  # [N, Ho, Wo, K*K, 2]

    sampled = bilinear_gather(x, coords.reshape(n, ho * wo * k * k, 2))
    return sampled.reshape(n, ho, wo, k * k, c)


def dcnv3_sample_ref(
    x: jax.Array,
    offsets: jax.Array,
    mask: jax.Array,
    kernel_size: int = 3,
    stride: int = 1,
    dilation: int = 1,
    offset_scale: float = 1.0,
) -> jax.Array:
    """Reference-exact DCNv3 sampling (``layers/dcn_v3/op.py:16`` +
    ``utils.py:14,65,110``), vectorized over all taps in one gather set.

    The reference pipeline has several load-bearing quirks that published
    reference checkpoints were trained with, reproduced here exactly:
    SAME-pads the input by ``dilation*(k-1)//2`` and normalizes every
    coordinate by the PADDED dims; builds reference points in (y, x) order
    but tap-grid/offset pairs in (x, y) order, so pair[0] mixes the row
    reference with column tap offsets; maps normalized coords to pixels
    with a ``(dim-2)`` scale (``utils.py:142-143``); and clips the four
    corner indices BEFORE computing interpolation deltas (border-replicate
    into the zero padding, ``utils.py:151-166``).

    Args:
      x: [B, H, W, C] grouped values (groups folded into B).
      offsets: [B, Ho, Wo, P, 2] raw offset-head outputs (pair layout as
        stored, i.e. (off0, off1) in the reference's mixed convention).
      mask: [B, Ho, Wo, P] softmaxed modulation.
    Returns: [B, Ho, Wo, C].
    """
    b, h, w, c = x.shape
    k = kernel_size
    p_total = k * k
    pad_h = pad_w = (dilation * (k - 1)) // 2
    xp = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    hp, wp = h + 2 * pad_h, w + 2 * pad_w
    ho = (hp - (dilation * (k - 1) + 1)) // stride + 1
    wo = (wp - (dilation * (k - 1) + 1)) // stride + 1

    f32 = jnp.float32
    start = (dilation * (k - 1)) // 2 + 0.5
    ref0 = (start + jnp.arange(ho, dtype=f32) * stride) / hp  # rows / Hp
    ref1 = (start + jnp.arange(wo, dtype=f32) * stride) / wp  # cols / Wp

    # tap grid, x-major flatten (reference generate_dilation_grids:
    # meshgrid(xs, ys, indexing='ij') -> p = a*k + b with dx=xs[a], dy=ys[b])
    base = -((dilation * (k - 1)) // 2)
    taps = base + jnp.arange(k, dtype=f32) * dilation
    dx_p = jnp.repeat(taps, k) / wp  # [P]
    dy_p = jnp.tile(taps, k) / hp    # [P]

    off0 = offsets[..., 0].astype(f32)  # [B, Ho, Wo, P]
    off1 = offsets[..., 1].astype(f32)
    loc0 = (ref0[None, :, None, None] + dx_p * offset_scale
            + off0 * offset_scale / wp)
    loc1 = (ref1[None, None, :, None] + dy_p * offset_scale
            + off1 * offset_scale / hp)

    x_pix = loc0 * (wp - 2)
    y_pix = loc1 * (hp - 2)

    x0 = jnp.floor(x_pix)
    y0 = jnp.floor(y_pix)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, wp - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, wp - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, hp - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, hp - 1)

    # deltas from the CLIPPED corners (reference utils.py:158-172)
    dx0 = x_pix - x0i.astype(f32)
    dx1 = x1i.astype(f32) - x_pix
    dy0 = y_pix - y0i.astype(f32)
    dy1 = y1i.astype(f32) - y_pix

    flat = xp.reshape(b, hp * wp, c)
    m = mask.astype(f32)

    def corner(yi, xi, wgt):
        idx = (yi * wp + xi).reshape(b, -1)  # [B, Ho*Wo*P]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(b, ho, wo, p_total, c)
        return vals * (wgt * m)[..., None].astype(x.dtype)

    out = (
        corner(y0i, x0i, dx1 * dy1)
        + corner(y1i, x0i, dx1 * dy0)
        + corner(y0i, x1i, dx0 * dy1)
        + corner(y1i, x1i, dx0 * dy0)
    )
    return out.sum(axis=3)


def dcnv3_ref_effective_offsets(
    offsets: jax.Array,
    h: int,
    w: int,
    kernel_size: int = 3,
    offset_scale: float = 1.0,
) -> jax.Array:
    """Re-express the reference DCNv3 sampling (:func:`dcnv3_sample_ref`)
    as LOCAL effective offsets on the TRANSPOSED value plane, unlocking the
    gather-free dense-local fast path for the reference-exact semantics.

    Key observation: the reference's mixed y/x pair convention means
    out[i, j] samples the input around pixel (row=j, col=i) — i.e. around
    (i, j) OF THE TRANSPOSED input — and its half-pixel base and (dim-2)
    pixel scaling are small position-dependent fractional shifts. On a
    square map both reduce to bounded per-position offsets:

        out = dense_local(transpose(x), eff_offsets, mask)

    is EXACTLY :func:`dcnv3_sample_ref` whenever every effective offset
    stays within the dense-local clamp. Square stride-1 dilation-1 maps
    only (the non-square reference drift term grows with position).

    Args:
      offsets: [B, Ho, Wo, P, 2] raw offset-head outputs (reference pair
        layout).
    Returns eff [B, Ho, Wo, P, 2] (dy, dx) offsets for
    :func:`deform_dense_local` applied to the transposed plane.
    """
    if h != w:
        raise ValueError(
            f"dense-local reference semantics needs a square map, got {h}x{w}")
    k = kernel_size
    pad = (k - 1) // 2
    hp = h + 2 * pad
    f32 = jnp.float32

    half = (k - 1) // 2
    taps = jnp.arange(k, dtype=f32) - half
    # dense_local tap enumeration: tap_y = repeat, tap_x = tile
    tap_y_dense = jnp.repeat(taps, k)  # [P]
    tap_x_dense = jnp.tile(taps, k)
    # reference tap enumeration (x-major: p = a*k + b, dx = taps[a])
    base = -((k - 1) // 2)
    ref_dx = (base + jnp.repeat(jnp.arange(k, dtype=f32), k))  # [P]
    ref_dy = (base + jnp.tile(jnp.arange(k, dtype=f32), k))

    i = jnp.arange(h, dtype=f32)[:, None]  # rows [Ho, 1]
    j = jnp.arange(w, dtype=f32)[:, None]  # cols [Wo, 1]
    off0 = offsets[..., 0].astype(f32)  # [B, Ho, Wo, P]
    off1 = offsets[..., 1].astype(f32)

    # reference pixel coords (dcnv3_sample_ref): x tracks the ROW index,
    # y tracks the COLUMN index; (hp-2)/hp is the squeeze factor
    sq = (hp - 2.0) / hp
    x_base = (pad + 0.5 + i) * sq - pad + ref_dx * offset_scale * sq  # [Ho, P]
    y_base = (pad + 0.5 + j) * sq - pad + ref_dy * offset_scale * sq  # [Wo, P]
    x_t = x_base[None, :, None, :] + off0 * offset_scale * sq
    y_t = y_base[None, None, :, :] + off1 * offset_scale * sq

    # transposed-plane local offsets: row coord of out[i,j] samples x_t
    eff_dy = x_t - (i[None, :, None] + tap_y_dense)          # [B,Ho,Wo,P]
    eff_dx = y_t - (jnp.arange(w, dtype=f32)[None, None, :, None]
                    + tap_x_dense)
    return jnp.stack([eff_dy, eff_dx], axis=-1)
