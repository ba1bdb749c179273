"""Deformable convolutions v2 and v3.

Parity with the reference ``layers/dcn_v2.py:16`` (``DCNv2``: offset+mask
conv, bilinear sampling, modulated kernel sum) and ``layers/dcn_v3/``
(``dcn_v3.py:16``: grouped sampling with softmax-normalized modulation,
input/output projections, as used by InternImage).

TPU-first: sampling goes through ``deform_im2col`` (one batched gather into
[N,H,W,K*K,C]); the convolution itself is then a dense [K*K*C, F] matmul on
the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.ops.deform import deform_im2col


class DCNv2(nn.Module):
    """Modulated deformable conv (reference ``layers/dcn_v2.py:16``)."""

    filters: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    # "gather" (exact, unbounded offsets) or "dense_local" (gather-free TPU
    # fast path, offsets clamped to +-max_local_offset; see DCNv3.sampling)
    sampling: str = "gather"
    max_local_offset: int = 2
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offset_input=None, train: bool = False):
        n, h, w, c = x.shape
        k = self.kernel_size
        kk = k * k

        # offsets + modulation from a regular conv (zero-init so the layer
        # starts as a plain conv, reference behavior). When offset_input is
        # given, the offset conv reads it instead of x — the reference's
        # use_custom_offset mode (layers/dcn_v2.py:64-67,270-273, used by
        # FaPN's FeatureAlignment, layers/fapn.py:57,74).
        off_mask = nn.Conv(
            3 * kk, (k, k), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation), padding="SAME",
            kernel_init=nn.initializers.zeros_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="offset_conv",
        )(x if offset_input is None else offset_input)
        offsets = off_mask[..., : 2 * kk].reshape(n, off_mask.shape[1],
                                                  off_mask.shape[2], kk, 2)
        mask = nn.sigmoid(off_mask[..., 2 * kk :])  # [N, Ho, Wo, K*K]

        if (self.sampling == "dense_local" and self.stride == 1
                and self.dilation == 1):
            from iseg_tpu.ops.deform import deform_dense_local_taps

            taps = deform_dense_local_taps(
                x, offsets, kernel_size=k, max_offset=self.max_local_offset
            )
        else:
            taps = deform_im2col(
                x, offsets, kernel_size=k, stride=self.stride,
                dilation=self.dilation,
            )  # [N, Ho, Wo, K*K, C]
        taps = taps * mask[..., None].astype(taps.dtype)

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kk * c, self.filters),
            self.param_dtype,
        )
        ho, wo = taps.shape[1], taps.shape[2]
        out = jnp.einsum(
            "nhwt,tf->nhwf",
            taps.reshape(n, ho, wo, kk * c),
            kernel.astype(taps.dtype),
            preferred_element_type=jnp.float32,
        ).astype(taps.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.filters,), self.param_dtype)
            out = out + bias.astype(out.dtype)
        return out


class DCNv3(nn.Module):
    """Grouped deformable conv v3 (reference ``layers/dcn_v3/dcn_v3.py:16``,
    XLA op ``op.py:16``): input proj -> depthwise-conv-derived offsets +
    softmax modulation per group -> grouped sampling -> output proj."""

    filters: int
    kernel_size: int = 3
    groups: int = 4
    stride: int = 1
    dilation: int = 1
    offset_scale: float = 1.0
    # "gather": reference-exact sampling (layers/dcn_v3/op.py:16 semantics
    #   incl. its half-pixel base grid and (dim-2) scaling — what published
    #   reference InternImage weights were trained with). Unbounded offsets,
    #   XLA gather (slow on TPU).
    # "dense_local_ref": the SAME reference-exact semantics through the
    #   gather-free dense-local machinery on the transposed value plane
    #   (ops.deform.dcnv3_ref_effective_offsets) — exact whenever every
    #   effective offset stays within +-max_local_offset; square stride-1
    #   dilation-1 maps only.
    # "gather_centered": clean centered DCN sampling (tap centers at
    #   integer pixels, zero outside) — the TPU-native from-scratch choice.
    # "dense_local": gather-free fast path of the centered semantics;
    #   offsets clamped to +-max_local_offset px (exact vs gather_centered
    #   whenever offsets stay in range).
    # "auto": dense_local_ref when the map qualifies, reference gather
    #   otherwise — drop-in for pretrained weights at dense speed.
    #   Pretrained ingest auto-calibrates the clamp (backbones/pretrained);
    #   training FROM SCRATCH under "auto" is exact only while learned
    #   offsets stay within max_local_offset — offsets drift during
    #   training, so prefer "gather"/"gather_centered" for from-scratch
    #   runs, or re-run calibrate_dcn_sampling periodically.
    sampling: str = "gather"
    max_local_offset: int = 2
    # Fence the group-fold relayouts and the sampling loop from each other
    # with jax.lax.optimization_barrier. Without the fences XLA fuses the
    # fold transposes INTO the dense-local displacement loop — re-running
    # the relayout for every one of the 49 shifted reads — and fuses the
    # loop into upstream/downstream GEMM fusions; measured on v5e
    # (tools/probe_internimage.py cliff section): the stage-3 block's
    # sampling goes 3.4 -> 1.2 ms and the full module math 7.2 -> 5.1 ms
    # with the fences; the module itself measured 15.9 ms unfenced. The
    # barrier is semantically an identity, so numerics are bit-identical.
    fusion_barriers: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        k = self.kernel_size
        kk = k * k
        g = self.groups
        if self.filters % g != 0:
            raise ValueError(f"filters {self.filters} not divisible by groups {g}")
        gc = self.filters // g

        # value projection
        v = nn.Dense(self.filters, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="value_proj")(x)

        # offset/modulation branch: depthwise conv + linear heads
        # (reference dcn_v3.py builds offsets from a dw-conv feature)
        feat = nn.Conv(
            c, (k, k), strides=(self.stride, self.stride),
            feature_group_count=c, padding="SAME",
            dtype=self.dtype, param_dtype=self.param_dtype, name="dw_conv",
        )(x)
        feat = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="offset_norm")(feat)
        feat = nn.gelu(feat, approximate=False)
        offsets = nn.Dense(2 * g * kk, kernel_init=nn.initializers.zeros_init(),
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="offset_head")(feat)
        modul = nn.Dense(g * kk, kernel_init=nn.initializers.zeros_init(),
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="mask_head")(feat)

        ho, wo = offsets.shape[1], offsets.shape[2]
        offsets = offsets.reshape(n, ho, wo, g, kk, 2)
        # softmax over the K*K taps per group (reference dcn_v3 semantics)
        modul = jax.nn.softmax(
            modul.reshape(n, ho, wo, g, kk).astype(jnp.float32), axis=-1
        ).astype(v.dtype)

        sampling = self.sampling
        if sampling not in ("auto", "gather", "gather_centered",
                            "dense_local", "dense_local_ref"):
            raise ValueError(f"unknown DCNv3 sampling mode {sampling!r}")
        local_ok = (self.stride == 1 and self.dilation == 1)
        if sampling == "auto":
            sampling = "dense_local_ref" if (h == w and local_ok) else "gather"
        elif sampling == "dense_local" and not local_ok:
            # the dense-local machinery is stride-1/dilation-1 only; stay
            # in the SAME (centered) semantics family rather than silently
            # switching to the reference-quirk sampler
            sampling = "gather_centered"
        elif sampling == "dense_local_ref" and not (h == w and local_ok):
            sampling = "gather"  # same reference semantics, general geometry

        # calibration tap: when the caller mutes "dcn_calibration"
        # (see iseg_tpu.nn.dcn.calibrate_dcn_sampling), record the max
        # reference-effective offset magnitude this layer produces — the
        # quantity the dense-local clamp must cover for exactness. A
        # dedicated collection so ordinary HookPoint "intermediates" taps
        # don't pay for (or receive) the offset statistics.
        # not during init: flax denies only "intermediates" there, so an
        # unguarded sow would bake a dcn_calibration collection into every
        # DCNv3 model's initial variables
        if (not self.is_initializing()
                and self.is_mutable_collection("dcn_calibration")
                and h == w and local_ok):
            from iseg_tpu.ops.deform import (
                dcnv3_ref_effective_offsets_grouped,
            )

            eff_dy_s, eff_dx_s = dcnv3_ref_effective_offsets_grouped(
                offsets, h, w, kernel_size=k, offset_scale=self.offset_scale)
            self.sow("dcn_calibration", "dcn_offset_mag",
                     jnp.maximum(jnp.max(jnp.abs(eff_dy_s)),
                                 jnp.max(jnp.abs(eff_dx_s))))

        if sampling in ("dense_local", "dense_local_ref"):
            # GROUPED dense-local path: no group-fold relayout. The fold's
            # transposes are never materialized by XLA — layout assignment
            # defers them into the 49-term loop so every shifted read pays
            # the relayout (probe_internimage: stage-3 module ran 15x its
            # parts sum). Values stay [N, H, W, G*gc]; only dense_local_ref
            # needs ONE spatial transpose (its output-index quirk), fenced
            # so it materializes once.
            m_flat = modul.reshape(n, ho, wo, g * kk)
            if sampling == "dense_local":
                from iseg_tpu.ops.deform import dense_local_flat

                sc = self.offset_scale
                off_dy = offsets[..., 0].reshape(n, ho, wo, g * kk) * sc
                off_dx = offsets[..., 1].reshape(n, ho, wo, g * kk) * sc
                out = dense_local_flat(
                    v, off_dy, off_dx, m_flat, g, k,
                    self.max_local_offset,
                )  # [N, Ho, Wo, filters]
            else:
                from iseg_tpu.ops.deform import (
                    dcnv3_ref_effective_offsets_grouped,
                    dense_local_flat,
                )

                eff_dy, eff_dx = dcnv3_ref_effective_offsets_grouped(
                    offsets, h, w, kernel_size=k,
                    offset_scale=self.offset_scale)
                vt = v.transpose(0, 2, 1, 3)
                if self.fusion_barriers:
                    vt, eff_dy, eff_dx, m_flat = jax.lax.optimization_barrier(
                        (vt, eff_dy, eff_dx, m_flat))
                out = dense_local_flat(
                    vt, eff_dy, eff_dx, m_flat, g, k,
                    self.max_local_offset,
                )  # [N, Ho, Wo, filters] (already output-indexed)
            return nn.Dense(self.filters, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="output_proj")(out)

        # fold groups into the batch dim for the gather paths: ONE batched
        # gather covers every group (a per-group python loop blows up the
        # HLO and compile time on deep InternImage stacks)
        vg = v.reshape(n, h, w, g, gc).transpose(0, 3, 1, 2, 4)
        vg = vg.reshape(n * g, h, w, gc)
        off_b = offsets.transpose(0, 3, 1, 2, 4, 5).reshape(n * g, ho, wo, kk, 2)
        mod_b = modul.transpose(0, 3, 1, 2, 4).reshape(n * g, ho, wo, kk)

        if sampling == "gather_centered":
            taps = deform_im2col(
                vg, off_b * self.offset_scale, kernel_size=k,
                stride=self.stride, dilation=self.dilation,
            )  # [N*G, Ho, Wo, K*K, gc]
            out = jnp.einsum("bhwtc,bhwt->bhwc", taps, mod_b)
        else:
            # reference-exact sampling pipeline (layers/dcn_v3/op.py:16) —
            # the semantics published InternImage-reference weights were
            # trained with
            from iseg_tpu.ops.deform import dcnv3_sample_ref

            out = dcnv3_sample_ref(
                vg, off_b, mod_b, kernel_size=k, stride=self.stride,
                dilation=self.dilation, offset_scale=self.offset_scale,
            )  # [N*G, Ho, Wo, gc]
        if self.fusion_barriers:
            out = jax.lax.optimization_barrier(out)
        out = out.reshape(n, g, ho, wo, gc).transpose(0, 2, 3, 1, 4)
        out = out.reshape(n, ho, wo, g * gc)  # [N, Ho, Wo, filters]

        return nn.Dense(self.filters, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="output_proj")(out)


def calibrate_dcn_sampling(model, variables, x, train: bool = False,
                           max_dense_r: int = 6, margin: float = 0.5):
    """Measure each DCNv3 layer's max reference-effective offset magnitude
    on a sample batch and recommend a per-layer sampling mode
    (VERDICT round-1 #4: quantify dense_local-vs-gather divergence and
    auto-select mode per layer).

    The dense-local fast path is EXACT while every effective offset stays
    within its clamp ``max_local_offset`` = r, at a cost growing with
    ``(K + 2r)^2``. This runs the model once with the "dcn_calibration"
    collection mutable (each DCNv3 sows its max |effective offset|), then
    recommends the smallest exact r per layer, falling back to the gather
    path when r would exceed ``max_dense_r``.

    Returns ``{layer_path: {"max_offset_mag": float, "recommended_r": int,
    "recommended_sampling": str}}``.
    """
    import flax

    kwargs = {"train": train} if train is not None else {}
    try:
        _, state = model.apply(variables, x, mutable=["dcn_calibration"],
                               **kwargs)
    except TypeError:  # model without a train kwarg
        _, state = model.apply(variables, x, mutable=["dcn_calibration"])

    flat = flax.traverse_util.flatten_dict(state.get("dcn_calibration", {}))
    report = {}
    for path, value in flat.items():
        if path[-1] != "dcn_offset_mag":
            continue
        mag = max(float(v) for v in value)  # sow stores a tuple per call
        r = int(np.ceil(mag + margin))
        report["/".join(path[:-1])] = {
            "max_offset_mag": mag,
            "recommended_r": r,
            "recommended_sampling": ("dense_local_ref" if r <= max_dense_r
                                     else "gather"),
        }
    return report
