"""Ring attention: blockwise context-parallel attention over a mesh axis.

The reference has no sequence/context parallelism anywhere (SURVEY.md §5
"Long-context / sequence parallelism: absent" — grep-verified); the
allgather-KV path (``nlp/gemma/model.py seq_axis``) was the first
TPU-native SP addition. This module adds the *long-context* formulation:
instead of gathering the full K/V onto every device (O(T) activation
memory per device and one [B,H,T_local,T] logits block), K/V blocks
rotate around the mesh axis with ``lax.ppermute`` while each device
accumulates flash-style online-softmax statistics for its query shard —
the Ring Attention formulation (Liu et al., 2023), which is how causal
attention scales past per-device HBM on TPU: compute on block ``i``
overlaps the ICI transfer of block ``i+1``, and no [T, T] (or even
[T_local, T]) score matrix ever materializes.

Memory: per step the device holds one K/V block ([B, T/N, KVH, D] — GQA
blocks rotate at the KV-head count, not the query-head count) plus
running (m, l, acc) statistics. The backward pass re-runs the ring
(autodiff through the ``lax.scan``; the per-step body is ``jax.checkpoint``
-ed so score/prob matrices are recomputed, not stored) — residuals are
the N carried K/V blocks, i.e. one full K/V copy per device, while score
matrices stay O(T_local^2) per step. For T where allgather-KV still fits,
both paths are numerically identical; ring wins when T grows.

Composability: plain jax ops under ``jax.shard_map``, differentiable
end-to-end, runs inside ``jit`` on the ambient mesh (``jax.set_mesh``) —
composes with DP (``batch_axis``) on a 2-D mesh, and with the Gemma
backbone via ``sp_mode="ring"`` (``nlp/gemma/model.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention"]

_NEG = jnp.float32(-1e30)


def _ring_device_program(q, k, v, q_pos, kv_pos, *, axis: str, n: int,
                         causal: bool):
    """Per-device body (inside shard_map). q: [B, Tl, H, D]; k/v:
    [B, Tl, KVH, D] local shards with KVH dividing H (GQA — the
    *unrepeated* blocks rotate, so ICI bytes and resident context stay
    at the KV-head count); q_pos/kv_pos: [B, Tl] global positions of the
    local tokens. Returns [B, Tl, H, D] output for the local queries."""
    b, tl, h, d = q.shape
    kvh = k.shape[2]
    rep = h // kvh
    qf = q.astype(jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def block(qf, k_c, v_c, kvp_c, m, l, acc):
        # grouped-query scores: contract against the UNREPEATED K/V block
        # (a repeat to h heads would materialize rep x the block bytes the
        # ring rotates to save); q head j = kv head j // rep, the same
        # contiguous grouping jnp.repeat would give
        kf = k_c.astype(jnp.float32)
        vf = v_c.astype(jnp.float32)
        ts = kf.shape[1]
        qg = qf.reshape(b, tl, kvh, rep, d)
        s = jnp.einsum("btkrd,bskd->bkrts", qg, kf).reshape(b, h, tl, ts)
        pad_ok = (kvp_c >= 0)[:, None, None, :]  # sentinel -1 = padding
        if causal:
            allowed = pad_ok & (
                kvp_c[:, None, None, :] <= q_pos[:, None, :, None])
        else:
            allowed = pad_ok & jnp.ones((1, 1, tl, 1), bool)
        s = jnp.where(allowed, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # masked entries must not contribute even when the whole block is
        # masked (m_new == _NEG would make exp(s - m_new) == 1 there)
        p = jnp.where(allowed, jnp.exp(s - m_new[..., None]), 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        pg = p.reshape(b, kvh, rep, tl, ts)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bkrts,bskd->bkrtd", pg, vf
        ).reshape(b, h, tl, d)
        return m_new, l, acc

    block = jax.checkpoint(block)  # recompute s/p in backward

    def tick(carry, _):
        k_c, v_c, kvp_c, m, l, acc = carry
        m, l, acc = block(qf, k_c, v_c, kvp_c, m, l, acc)
        k_n = jax.lax.ppermute(k_c, axis, perm)
        v_n = jax.lax.ppermute(v_c, axis, perm)
        kvp_n = jax.lax.ppermute(kvp_c, axis, perm)
        return (k_n, v_n, kvp_n, m, l, acc), None

    m0 = jnp.full((b, h, tl), _NEG)
    l0 = jnp.zeros((b, h, tl), jnp.float32)
    acc0 = jnp.zeros((b, h, tl, d), jnp.float32)
    # n-1 rotations suffice: the last block is consumed outside the scan
    # so no tick permutes K/V into a carry nobody reads (saves one full
    # K/V-block ICI hop per layer per step, fwd and bwd)
    (k_l, v_l, kvp_l, m, l, acc), _ = jax.lax.scan(
        tick, (k, v, kv_pos, m0, l0, acc0), None, length=n - 1
    )
    _, l, acc = block(qf, k_l, v_l, kvp_l, m, l, acc)
    out = acc / jnp.maximum(l, 1e-30)[..., None]  # [B, H, Tl, D]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    positions: jax.Array,
    axis: str,
    batch_axis: Optional[str] = None,
    causal: bool = True,
    kv_positions: Optional[jax.Array] = None,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Context-parallel attention for sequence-sharded global arrays.

    ``q``: [B, T, H, D]; ``k``/``v``: [B, T, KVH, D] with KVH dividing H
    (pass the raw GQA KV heads — blocks rotate unrepeated and are
    broadcast to the query heads per-block on-device). The T axis is
    sharded over ``axis``. ``positions``: [B, T] global token positions
    (the causal mask is ``kv_pos <= q_pos``, matching
    ``nlp/gemma/model.py causal_mask``). The caller pre-scales ``q``
    (e.g. by ``head_dim ** -0.5``).

    Runs on the ambient mesh (``jax.set_mesh``) unless ``mesh`` is given;
    ``batch_axis`` shards B for DP composition. Softmax/accumulation in
    fp32; output in ``q.dtype``.
    """
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh.empty:
            raise ValueError(
                "ring_attention needs a mesh: pass mesh= or run under "
                "jax.set_mesh(mesh)"
            )
    n = mesh.shape[axis]
    b, t, h, _ = q.shape
    if t % n != 0:
        raise ValueError(
            f"sequence length {t} is not divisible by the {axis}-axis "
            f"size {n}; pad the sequence to a multiple of the ring size"
        )
    if k.shape[2] == 0 or h % k.shape[2] != 0:
        raise ValueError(
            f"query heads {h} must be a multiple of kv heads {k.shape[2]}"
        )
    if batch_axis is not None and b % mesh.shape[batch_axis] != 0:
        raise ValueError(
            f"batch {b} is not divisible by the {batch_axis}-axis size "
            f"{mesh.shape[batch_axis]}"
        )
    if kv_positions is None:
        kv_positions = positions
    qkv_spec = P(batch_axis, axis, None, None)
    pos_spec = P(batch_axis, axis)
    fn = partial(_ring_device_program, axis=axis, n=n, causal=causal)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, pos_spec, pos_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )(q, k, v, positions, kv_positions)
