"""Pallas window attention: whole windows resident in VMEM.

Swin's attention geometry (T=49, head_dim=32, thousands of windows) is the
opposite of flash-attention territory: each (window, head) attention is a
pair of tiny matmuls with a rel-pos-bias add and a softmax between them.
XLA lowers this to a chain of small batched ops that measured ~20x above
both the FLOP and HBM rooflines at Swin-L stage geometry, invariant to
formulation (tools/probe_swin_attention.py — current/minbias/einsum all
equal). This kernel keeps one window-batch's q/k/v resident in VMEM and
fuses the whole chain: logits -> +bias (+shift mask) -> softmax -> @v, one
grid step per window, fori over heads.

Backward is a second kernel (same residency) that recomputes the softmax
in VMEM and produces dq/dk/dv plus the bias gradient accumulated across
the sequential TPU grid (reference semantics: relative-position-bias table
is learned, ``backbones/swin.py:67-179``).

MEASURED OUTCOME (BENCH_NOTES round 3): on TPU v5e this kernel runs 1.9x
SLOWER than XLA's lowering at Swin-L stage-3 geometry (3.63 vs 1.92 ms
fwd) — the HBM round-trips it eliminates cost less than the sequential
small-matmul issue rate it pays (9600 [49x32] MXU ops/layer). It ships as
a correct, tested optional path (like ``deform_local``); the Swin layers
stay on the XLA path, which five independent probe formulations show is
already at the achievable floor for this op shape.

The shift mask is always passed (zeros when unused) so there is a single
code path; its block is selected per window by ``index_map`` modulo, so
shifted and unshifted blocks share the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *, scale):
    h_count = q_ref.shape[1]
    mask = mask_ref[0].astype(jnp.float32)

    def head(h, _):
        q = q_ref[0, h].astype(jnp.float32)  # [N, D]
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = logits + bias_ref[h].astype(jnp.float32) + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(p, v, preferred_element_type=jnp.float32)
        out_ref[0, h] = out.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h_count, head, 0)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, scale):
    h_count = q_ref.shape[1]
    mask = mask_ref[0].astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _zero_dbias():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    def head(h, _):
        q = q_ref[0, h].astype(jnp.float32)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = logits + bias_ref[h].astype(jnp.float32) + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # [Nq, Nk]

        # dv = p^T @ do ; dp = do @ v^T ; softmax vjp ; dq/dk
        dv = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Nk, D]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Nq, Nk]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [Nq, D]
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [Nk, D]

        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)
        dbias_ref[h] = dbias_ref[h] + ds
        return 0

    jax.lax.fori_loop(0, h_count, head, 0)


def _specs(bnw, h, n, d, nw):
    qspec = pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((h, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, n, n), lambda i: (i % nw, 0, 0),
                             memory_space=pltpu.VMEM)
    return qspec, bias_spec, mask_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def window_attention(q, k, v, bias, mask, scale, interpret=False):
    """Fused window attention.

    Args:
      q, k, v: ``[bnw, H, N, D]`` (window-batch, heads, tokens, head dim).
      bias: ``[H, N, N]`` relative-position bias (learned; gets a grad).
      mask: ``[nW, N, N]`` additive shift mask, selected per window as
        ``window_index % nW`` (pass zeros ``[1, N, N]`` when unshifted).
      scale: attention scale (1/sqrt(D)).
    Returns ``[bnw, H, N, D]``.
    """
    return _forward(q, k, v, bias, mask, scale, interpret)


def _forward(q, k, v, bias, mask, scale, interpret):
    bnw, h, n, d = q.shape
    nw = mask.shape[0]
    qspec, bias_spec, mask_spec = _specs(bnw, h, n, d, nw)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bnw,),
        in_specs=[qspec, qspec, qspec, bias_spec, mask_spec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias, mask)


def _fwd_rule(q, k, v, bias, mask, scale, interpret):
    out = _forward(q, k, v, bias, mask, scale, interpret)
    return out, (q, k, v, bias, mask)


def _bwd_rule(scale, interpret, residuals, dout):
    q, k, v, bias, mask = residuals
    bnw, h, n, d = q.shape
    nw = mask.shape[0]
    qspec, bias_spec, mask_spec = _specs(bnw, h, n, d, nw)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bnw,),
        in_specs=[qspec, qspec, qspec, bias_spec, mask_spec, qspec],
        out_specs=[qspec, qspec, qspec,
                   pl.BlockSpec((h, n, n), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias, mask, dout)
    return dq, dk, dv, dbias.astype(bias.dtype), None


window_attention.defvjp(_fwd_rule, _bwd_rule)


def window_attention_reference(q, k, v, bias, mask, scale):
    """XLA reference (same [bnw, H, N, D] layout) for tests/fallback."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    nw = mask.shape[0]
    bnw = q.shape[0]
    mask_b = mask[jnp.arange(bnw) % nw]
    logits = logits + bias[None].astype(jnp.float32) \
        + mask_b[:, None].astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)
