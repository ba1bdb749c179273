"""Weight-only int8 quantization for bandwidth-bound serving.

Decode reads every weight once per token, so HBM bytes — not MXU FLOPs —
set the ceiling (BENCH_NOTES: bf16 decode runs at its bandwidth roofline).
Storing weights as int8 + per-output-channel scales halves the bytes; the
dequant (convert + multiply) fuses into each matmul's operand read.

The subtlety is the decode ``lax.scan``: weights are loop-invariant, so a
naive top-of-function dequant gets hoisted out of the loop and
materialized in bf16 — zero savings. ``dequantize_tree(..., barrier=True)``
routes the int8 arrays through ``lax.optimization_barrier`` INSIDE the
scan body, forcing per-step fused dequant from int8-resident HBM.

    qparams = quantize_tree(variables["params"])
    out = lm.generate({"params": qparams}, prompt, lengths, max_length=...)

``GemmaCausalLM`` dequantizes transparently (per scan step) when it finds
``QTensor`` leaves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """int8 data + per-output-channel bf16 scales (symmetric)."""

    q: jax.Array       # int8, same shape as the original weight
    scale: jax.Array   # bf16, shape = original.shape[-1:]


def quantize_tree(params, min_size: int = 4096, dtype=jnp.bfloat16):
    """Quantize every >=2-D weight with ``size >= min_size`` to int8 with
    per-last-axis symmetric scales; small leaves (biases, norm scales) are
    cast to ``dtype`` and left dense."""

    def quantize(w):
        if w.ndim >= 2 and w.size >= min_size:
            absmax = jnp.max(jnp.abs(w.astype(jnp.float32)),
                             axis=tuple(range(w.ndim - 1)), keepdims=False)
            scale = jnp.maximum(absmax, 1e-8) / 127.0
            # round the scale to its storage dtype FIRST so quantization
            # and dequantization share the exact same scale (error stays
            # within half a quantization step)
            scale = scale.astype(dtype)
            q = jnp.clip(jnp.round(
                w.astype(jnp.float32) / scale.astype(jnp.float32)),
                -127, 127)
            return QTensor(q.astype(jnp.int8), scale)
        return w.astype(dtype) if jnp.issubdtype(w.dtype, jnp.floating) else w

    return jax.tree_util.tree_map(quantize, params)


def dequantize_tree(params, barrier: bool = False, dtype=jnp.bfloat16):
    """Rebuild a dense tree from a quantized one. With ``barrier=True``
    the int8 leaves pass through ``lax.optimization_barrier`` first so the
    dequant cannot be hoisted out of an enclosing loop (stays fused with
    each consumer's operand read)."""

    def dequantize(leaf):
        if isinstance(leaf, QTensor):
            q, scale = leaf.q, leaf.scale
            if barrier:
                q, scale = jax.lax.optimization_barrier((q, scale))
            return q.astype(dtype) * scale.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(
        dequantize, params, is_leaf=lambda x: isinstance(x, QTensor))


def is_quantized(params) -> bool:
    found = False

    def visit(leaf):
        nonlocal found
        if isinstance(leaf, QTensor):
            found = True
        return leaf

    jax.tree_util.tree_map(visit, params,
                           is_leaf=lambda x: isinstance(x, QTensor))
    return found
