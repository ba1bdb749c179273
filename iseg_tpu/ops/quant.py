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

from typing import Any, NamedTuple

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


# ---------------------------------------------------------------------------
# W8A8: int8-resident matmuls (weights AND dynamically-quantized activations)
# ---------------------------------------------------------------------------

import flax.linen as nn


def dynamic_int8_dot(x2: jax.Array, w_q: jax.Array,
                     w_scale: jax.Array) -> jax.Array:
    """[M, K] float @ [K, N] int8 -> [M, N] float32.

    Per-row dynamic activation scales + per-column weight scales; the dot
    itself is int8 x int8 -> int32, so the weight operand is read from HBM
    as int8 (no convert in the operand path — the true bandwidth win the
    weight-only dequant path couldn't get, see BENCH_NOTES)."""
    sx = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(sx, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x2.astype(jnp.float32) / sx),
                   -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * w_scale.astype(jnp.float32)[None, :]


class QuantDense(nn.Module):
    """Dense/DenseGeneral replacement with a switchable int8 path.

    Declares ``kernel`` plus an always-present ``kernel_scale`` (ones,
    honored only on the int8 path). When a quantized param tree is passed
    to ``apply`` (int8 ``kernel`` + real ``kernel_scale``, see
    :func:`quantize_dense_tree`), the dot runs int8 x int8 -> int32 with
    dynamic per-row activation scales (W8A8). With a float kernel it
    computes exactly like ``nn.DenseGeneral`` — no extra ops.

    Contraction axes must be trailing (the only forms Gemma uses:
    ``axis=-1`` or ``axis=(-2, -1)``)."""

    features: Any  # int or tuple[int, ...]
    axis: Any = -1  # int or tuple[int, ...] (trailing only)
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = (self.features,) if isinstance(self.features, int) \
            else tuple(self.features)
        axes = (self.axis,) if isinstance(self.axis, int) \
            else tuple(self.axis)
        n_axes = len(axes)
        assert tuple(axes) == tuple(range(-n_axes, 0)), (
            "QuantDense supports trailing contraction axes only")
        contract = x.shape[-n_axes:]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*contract, *feats), self.param_dtype)
        scale = self.param("kernel_scale", nn.initializers.ones_init(),
                           feats, jnp.float32)

        k_dim = 1
        for c in contract:
            k_dim *= c
        n_dim = 1
        for f in feats:
            f = int(f)
            n_dim *= f
        x2 = x.reshape(-1, k_dim)
        w2 = kernel.reshape(k_dim, n_dim)

        if kernel.dtype == jnp.int8:
            y2 = dynamic_int8_dot(x2, w2, scale.reshape(n_dim))
        else:
            # float path: kernel_scale is NOT applied (it only carries the
            # int8 scales) — keeps the dense path free of the extra
            # per-projection elementwise op, which measurably costs decode
            # throughput inside the scan (BENCH_NOTES)
            cdtype = self.dtype or jnp.result_type(x, kernel)
            y2 = x2.astype(cdtype) @ w2.astype(cdtype)

        out_dtype = self.dtype or x.dtype
        y = y2.reshape(*x.shape[:-n_axes], *feats).astype(out_dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), feats,
                              self.param_dtype)
            y = y + bias.astype(out_dtype)
        return y


def quantize_dense_tree(params, dtype=jnp.bfloat16):
    """Quantize every QuantDense kernel in ``params`` to int8 in place of
    its float value, filling the sibling ``kernel_scale`` — the W8A8
    serving transform (pass the result straight to ``apply``/``generate``;
    ``QuantDense`` switches on the kernel dtype). Non-QuantDense leaves
    are cast to ``dtype``."""

    def walk(node):
        if isinstance(node, dict):
            if "embedding" in node and "embedding_scale" in node:
                w = jnp.asarray(node["embedding"], jnp.float32)  # [V, D]
                absmax = jnp.max(jnp.abs(w), axis=-1)  # per vocab row
                scale = jnp.maximum(absmax, 1e-8) / 127.0
                q = jnp.clip(jnp.round(w / scale[:, None]), -127, 127)
                out = dict(node)
                out["embedding"] = q.astype(jnp.int8)
                out["embedding_scale"] = scale.astype(jnp.float32)
                for k, v in out.items():
                    if k not in ("embedding", "embedding_scale"):
                        out[k] = walk(v)
                return out
            if "kernel" in node and "kernel_scale" in node:
                w = jnp.asarray(node["kernel"], jnp.float32)
                feats = node["kernel_scale"].shape
                reduce_axes = tuple(range(w.ndim - len(feats)))
                absmax = jnp.max(jnp.abs(w), axis=reduce_axes)
                scale = jnp.maximum(absmax, 1e-8) / 127.0
                q = jnp.clip(jnp.round(w / scale), -127, 127)
                out = dict(node)
                out["kernel"] = q.astype(jnp.int8)
                out["kernel_scale"] = scale.astype(jnp.float32)
                for k, v in out.items():
                    if k not in ("kernel", "kernel_scale"):
                        out[k] = walk(v)
                return out
            return {k: walk(v) for k, v in node.items()}
        if hasattr(node, "dtype") and jnp.issubdtype(node.dtype,
                                                     jnp.floating):
            return node.astype(dtype)
        return node

    return walk(params)


class QuantEmbed(nn.Module):
    """Tied embedding with a switchable int8 path (per-vocab-row scales).

    Same param name/shape as ``nn.Embed`` (``embedding`` [V, D]) plus
    ``embedding_scale`` [V] (ones, honored only when the table is int8).
    ``__call__`` looks rows up (dequantizing on the fly when int8);
    ``attend`` is the tied logits readout — int8-resident when quantized
    (the [V, D] table is the read that dominates an LLM's logits matmul).
    """

    num_embeddings: int
    features: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def setup(self):
        self.embedding = self.param(
            "embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal",
                                             out_axis=0),
            (self.num_embeddings, self.features), self.param_dtype)
        self.embedding_scale = self.param(
            "embedding_scale", nn.initializers.ones_init(),
            (self.num_embeddings,), jnp.float32)

    def __call__(self, ids):
        out_dtype = self.dtype or (
            self.param_dtype if self.embedding.dtype == jnp.int8
            else self.embedding.dtype)
        rows = jnp.take(self.embedding, ids, axis=0)
        if self.embedding.dtype == jnp.int8:
            scale = jnp.take(self.embedding_scale, ids, axis=0)
            return rows.astype(out_dtype) * scale.astype(out_dtype)[..., None]
        return rows.astype(out_dtype)

    def attend(self, hidden):
        """hidden [..., D] -> logits [..., V] against the tied table."""
        lead = hidden.shape[:-1]
        h2 = hidden.reshape(-1, self.features)
        if self.embedding.dtype == jnp.int8:
            y2 = dynamic_int8_dot(h2, self.embedding.T, self.embedding_scale)
        else:
            y2 = h2.astype(jnp.float32) @ self.embedding.astype(jnp.float32).T
        return y2.reshape(*lead, self.num_embeddings)
