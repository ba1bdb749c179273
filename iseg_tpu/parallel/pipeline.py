"""Pipeline parallelism: GPipe schedule over a mesh axis.

The reference has no pipeline parallelism anywhere (SURVEY.md §2.2: "Absent:
PP, SP/CP, EP" — grep-verified); this is a TPU-native addition so the
framework covers the full dp/tp/pp/sp/ep sharding surface on one
``jax.sharding.Mesh``.

Design (the idiomatic JAX/TPU formulation, not a runtime scheduler):

* the pipelined unit is a *stage function* applied to a stack of
  per-stage parameters whose leading axis is sharded over the ``stage``
  mesh axis — ``shard_map`` hands each device its own stage's params;
* the GPipe schedule is a single ``lax.scan`` over
  ``num_microbatches + num_stages - 1`` ticks; at each tick every device
  runs its stage on its current microbatch and passes the activation to
  the next stage with ``lax.ppermute`` (one ICI hop on TPU);
* per-microbatch *constants* (positions, attention masks, labels) never
  ride the ppermute: at tick ``t`` stage ``s`` is working on microbatch
  ``t - s``, so each device indexes the replicated constant stack
  directly — zero ICI traffic for side inputs;
* everything inside is differentiable (``ppermute`` transposes to the
  reverse permute), so ``jax.grad`` through :func:`pipeline_spmd` yields a
  correct pipeline-parallel *training* step with per-stage gradients
  landing on the device that owns the stage — no hand-written backward
  schedule.

Bubble fraction is the usual (S-1)/(M+S-1); choose ``num_microbatches``
a few multiples of the stage count.

Memory note: what shards over stages is the *weights* and the per-layer
backward residuals (each device saves activations only for its own
stage's layers — the dominant activation term, scaling 1/S). The
microbatch input stack, per-microbatch constants, and output bank are
replicated on every stage device (shard_map replicated specs) — a
constant ~2 extra copies of ONE layer-boundary activation, independent
of depth. Keep ``const`` small (indices/positions, not precomputed
masks — see ``nlp/gemma/pipeline.py``'s in-stage mask build).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_spmd", "stack_params", "unstack_params"]


def stack_params(param_list: list[Any]) -> Any:
    """Stack a list of identically-structured pytrees along a new leading
    axis (stage/layer axis). The inverse of :func:`unstack_params`."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *param_list)


def unstack_params(stacked: Any, n: int) -> list[Any]:
    return [
        jax.tree_util.tree_map(lambda x, i=i: x[i], stacked) for i in range(n)
    ]


def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def pipeline_spmd(
    stage_fn: Callable[..., Any],
    mesh: Mesh,
    axis: str,
    num_microbatches: int,
    batch_axis: str | None = None,
) -> Callable[..., Any]:
    """Build a pipelined ``f(stage_params, x, const=None) -> y``.

    ``stage_fn(params_i, state[, const_mb]) -> state`` maps one microbatch
    through one stage; the activation ``state`` (an array or pytree of
    arrays, each ``[mb, ...]``) must keep a fixed structure across stages
    (the transformer case). ``stage_params`` leaves carry a leading
    ``num_stages`` axis (see :func:`stack_params`), sharded over ``axis``
    by the returned function. ``x`` (and the optional ``const``) are the
    *global* batch ``[B, ...]``; the microbatch split/merge is internal.
    ``const`` is passed through to ``stage_fn`` indexed at the microbatch
    each stage is currently processing. The returned ``y`` is replicated
    over ``axis``.

    ``batch_axis`` composes DP with PP on a 2-D mesh: the microbatch dim
    is sharded over it (each data-shard runs its own pipeline; per-stage
    parameter gradients are psum'd over the batch axis by the shard_map
    transpose automatically).
    """
    num_stages = mesh.shape[axis]
    m = num_microbatches
    if m < 1:
        raise ValueError("num_microbatches must be >= 1")

    def pipelined(stage_params, x, const=None):
        has_const = const is not None
        leaves = jax.tree_util.tree_leaves(x)
        b = leaves[0].shape[0]
        if b % m != 0:
            raise ValueError(f"batch {b} not divisible by microbatches {m}")
        mb = b // m
        if batch_axis is not None and mb % mesh.shape[batch_axis] != 0:
            raise ValueError(
                f"microbatch size {mb} (= batch {b} / {m} microbatches) is "
                f"not divisible by the {batch_axis!r}-axis size "
                f"{mesh.shape[batch_axis]}; pick num_microbatches so each "
                "microbatch splits evenly across the data shards"
            )
        micro = _tmap(lambda a: a.reshape(m, mb, *a.shape[1:]), x)
        cmicro = (
            _tmap(lambda a: a.reshape(m, mb, *a.shape[1:]), const)
            if has_const else None
        )

        def device_program(local_params, micro_local, cmicro_local):
            # inside shard_map: local_params leaves are [1, ...] (this
            # device's stage); micro_local / cmicro_local are the full
            # [M, mb, ...] stacks (replicated input spec)
            params_i = _tmap(lambda p: p[0], local_params)
            stage = jax.lax.axis_index(axis)
            is_first = stage == 0
            is_last = stage == num_stages - 1
            perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

            ybuf0 = _tmap(lambda a: jnp.zeros_like(a), micro_local)
            recv0 = _tmap(lambda a: jnp.zeros(a.shape[1:], a.dtype),
                          micro_local)

            def idx_mb(stack, t):
                return _tmap(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, jnp.clip(t, 0, m - 1), 0, keepdims=False
                    ),
                    stack,
                )

            def compute(recv, ybuf, t):
                x_in = idx_mb(micro_local, t)
                state = _tmap(
                    lambda a, r: jnp.where(is_first, a, r), x_in, recv
                )
                if has_const:
                    # stage s is processing microbatch t - s
                    const_mb = idx_mb(cmicro_local, t - stage)
                    y = stage_fn(params_i, state, const_mb)
                else:
                    y = stage_fn(params_i, state)
                # last stage banks finished microbatch t-(S-1)
                out_t = t - (num_stages - 1)
                idx = jnp.clip(out_t, 0, m - 1)
                write = is_last & (out_t >= 0)

                def bank(buf, yv):
                    cur = jax.lax.dynamic_index_in_dim(
                        buf, idx, 0, keepdims=False
                    )
                    val = jnp.where(write, yv, cur)
                    return jax.lax.dynamic_update_index_in_dim(
                        buf, val, idx, 0
                    )

                return y, _tmap(bank, ybuf, y)

            def tick(carry, t):
                recv, ybuf = carry
                y, ybuf = compute(recv, ybuf, t)
                # rotate: stage i's output becomes stage i+1's next input
                # (the wrap back to stage 0 is masked out by ``is_first``)
                recv_next = _tmap(
                    lambda a: jax.lax.ppermute(a, axis, perm), y
                )
                return (recv_next, ybuf), None

            total = m + num_stages - 1
            # the final tick's output feeds nothing downstream — run it
            # outside the scan so its ppermute (one full activation-pytree
            # ICI hop per invocation, fwd and transposed bwd) never exists
            (recv, ybuf), _ = jax.lax.scan(
                tick, (recv0, ybuf0), jnp.arange(total - 1)
            )
            _, ybuf = compute(recv, ybuf, jnp.int32(total - 1))
            # broadcast the last stage's outputs to every device so the
            # caller gets a replicated result (transpose-friendly psum)
            return _tmap(
                lambda a: jax.lax.psum(
                    jnp.where(is_last, a, jnp.zeros_like(a)), axis
                ),
                ybuf,
            )

        param_spec = _tmap(
            lambda p: P(axis, *([None] * (p.ndim - 1))), stage_params
        )
        data_spec = P(None, batch_axis) if batch_axis else P()
        y = jax.shard_map(
            device_program,
            mesh=mesh,
            in_specs=(param_spec, data_spec, data_spec),
            out_specs=data_spec,
            check_vma=False,
        )(stage_params, micro, cmicro)
        return _tmap(lambda a: a.reshape(b, *a.shape[2:]), y)

    return pipelined
