"""Mixture-of-Experts feed-forward with expert parallelism.

The reference has no MoE/EP anywhere (SURVEY.md §2.2: "Absent: PP, SP/CP,
EP" — grep-verified); this is a TPU-native addition completing the
dp/tp/pp/sp/ep sharding surface.

Design — the GShard/Switch einsum formulation, which is how MoE maps onto
TPUs: routing produces a dense ``[tokens, experts, capacity]`` dispatch
tensor, expert inputs/outputs are plain einsums (MXU work, static shapes),
and expert parallelism is nothing but sharding the expert axis of the
weights and the dispatched activations over a mesh axis — GSPMD inserts
the all-to-alls. No ragged ops, no host-side routing, fully jittable and
differentiable.

* top-k routing: k=1 Switch (raw router prob as the gate, task-trainable
  router) or k>=2 GShard (gates renormalized over the selected k);
* fixed per-expert capacity ``ceil(k * tokens / experts) * factor``;
  overflow tokens are dropped (their combine weight is zero), matching
  the standard formulation;
* load-balance auxiliary loss ``E * sum_e f_e * P_e`` (Switch eq. 4),
  returned alongside the output for the caller to add to the objective.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from iseg_tpu.parallel.constrain import constrain as _constrain

__all__ = ["MoEFeedForward"]


def topk_dispatch(probs: jax.Array, k: int, capacity: int):
    """Build combine/dispatch tensors from router probabilities.

    probs: [G, E]. Returns (combine [G, E, C] float, dispatch [G, E, C]
    bool, aux_loss scalar). Token order is priority order within each
    expert (earlier tokens win capacity slots), the standard deterministic
    tie-break.
    """
    g, e = probs.shape

    # load-balance aux loss uses the pre-selection distribution: f_e from
    # the top-1 assignment, P_e the mean router prob (Switch eq. 4)
    top1 = jnp.argmax(probs, axis=-1)
    f = jnp.mean(jax.nn.one_hot(top1, e, dtype=probs.dtype), axis=0)
    p_mean = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(f * p_mean)

    remaining = probs
    counts = jnp.zeros((e,), jnp.int32)
    gates, idxs, poss = [], [], []
    for _ in range(k):
        idx = jnp.argmax(remaining, axis=-1)  # [G]
        gate = jnp.take_along_axis(remaining, idx[:, None], axis=1)[:, 0]
        mask = jax.nn.one_hot(idx, e, dtype=jnp.int32)  # [G, E]
        # position of each token within its chosen expert's queue
        pos_in_round = jnp.cumsum(mask, axis=0) - 1  # [G, E]
        pos = jnp.sum(pos_in_round * mask, axis=1) + counts[idx]  # [G]
        counts = counts + jnp.sum(mask, axis=0)
        gates.append(gate)
        idxs.append(idx)
        poss.append(pos)
        remaining = remaining * (1 - mask.astype(remaining.dtype))

    gate_stack = jnp.stack(gates, axis=1)  # [G, k]
    if k > 1:
        # GShard: renormalize over the selected k
        denom = jnp.maximum(jnp.sum(gate_stack, axis=1, keepdims=True), 1e-9)
        gate_stack = gate_stack / denom
    # k == 1 keeps the RAW router prob (Switch eq. 2): renormalizing a
    # single gate yields the constant 1, which kills the router's task
    # gradient — the prob multiplier is what makes routing task-trainable

    combine = jnp.zeros((g, e, capacity), probs.dtype)
    for i in range(k):
        keep = (poss[i] < capacity).astype(probs.dtype)
        onehot_e = jax.nn.one_hot(idxs[i], e, dtype=probs.dtype)
        onehot_c = jax.nn.one_hot(poss[i], capacity, dtype=probs.dtype)
        combine = combine + (
            (gate_stack[:, i] * keep)[:, None, None]
            * onehot_e[:, :, None] * onehot_c[:, None, :]
        )
    dispatch = combine > 0
    return combine, dispatch, aux


class MoEFeedForward(nn.Module):
    """Top-k routed GeLU MLP over the last axis.

    Input ``[..., D]`` -> (output ``[..., D]``, aux_loss). Set
    ``expert_axis`` (and run under ``jax.set_mesh``) to shard experts
    over a mesh axis — expert parallelism.
    """

    num_experts: int
    d_ff: int
    k: int = 2
    capacity_factor: float = 1.25
    expert_axis: Optional[str] = None
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_shape = x.shape
        d = orig_shape[-1]
        xt = x.reshape(-1, d)
        g = xt.shape[0]
        e, ff = self.num_experts, self.d_ff
        capacity = max(1, math.ceil(self.capacity_factor * self.k * g / e))

        wg = self.param("router", nn.initializers.lecun_normal(),
                        (d, e), self.param_dtype)
        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (e, d, ff), self.param_dtype)
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (e, ff, d), self.param_dtype)

        # router in fp32 (tiny matmul; routing decisions are
        # precision-sensitive)
        logits = xt.astype(jnp.float32) @ wg.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        combine, dispatch, aux = topk_dispatch(probs, self.k, capacity)
        combine = combine.astype(xt.dtype)

        ax = self.expert_axis
        w1 = _constrain(w1, ax, None, None)
        w2 = _constrain(w2, ax, None, None)
        # dispatch: [G, E, C] x [G, D] -> [E, C, D]; constraining the
        # expert tensors' E axis makes GSPMD all-to-all the tokens to
        # their expert's device
        xe = jnp.einsum("gec,gd->ecd", dispatch.astype(xt.dtype), xt)
        xe = _constrain(xe, ax, None, None)
        h = jax.nn.gelu(
            jnp.einsum("ecd,edf->ecf", xe, w1.astype(xe.dtype))
        )
        h = _constrain(h, ax, None, None)
        ye = jnp.einsum("ecf,efd->ecd", h, w2.astype(h.dtype))
        ye = _constrain(ye, ax, None, None)
        y = jnp.einsum("gec,ecd->gd", combine, ye)
        return y.reshape(orig_shape), aux
