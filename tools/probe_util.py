"""Shared probe timing helpers.

Timing model on this rig (measured, see BENCH_NOTES round 4): one jitted
lax.scan dispatch over the axon tunnel costs ~22 ms FIXED (dispatch +
host sync + result readback) plus the per-iteration body time. Probes
therefore (a) chain ITERS=128 iterations with a data dependence so the
body cannot be hoisted, and (b) subtract a calibrated null-scan baseline
of the same length. Gradients must feed the carry — an unused gradient
output is dead-code-eliminated and "fwd+bwd" silently measures fwd-only
(the round-4 harness bug this file fixes).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 128

_null_cache = {}


def _null_ms(iters):
    """Total ms of a scan whose body is one scalar add — the fixed
    dispatch + loop overhead to subtract."""
    if iters in _null_cache:
        return _null_cache[iters]

    def body(carry, _):
        return carry + jnp.float32(1e-6), None

    scan = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=iters)[0])
    _ = float(scan())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(scan())
        best = min(best, time.perf_counter() - t0)
    _null_cache[iters] = best * 1e3
    return _null_cache[iters]


def tree_sum(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)


def _run_scan(body, iters):
    scan = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=iters)[0])
    v = float(scan())
    assert v == v, "non-finite probe result"
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(scan())
        best = min(best, time.perf_counter() - t0)
    return max(0.0, best * 1e3 - _null_ms(iters)) / iters


def time_fn(fn, *args, iters=ITERS):
    """ms per call of ``fn(*args)`` (fwd only)."""

    def body(carry, _):
        perturbed = args[0] + (carry * 1e-6).astype(args[0].dtype)
        out = fn(*((perturbed,) + args[1:]))
        return tree_sum(out), None

    return _run_scan(body, iters)


def time_module(module, shapes, train=True, dtype=jnp.bfloat16,
                extra_args=(), iters=ITERS, backward=True,
                takes_train=True):
    """ms for one application of a flax ``module`` on random inputs of
    ``shapes``; ``backward=True`` adds grads wrt params AND inputs.
    ``takes_train=False`` for modules without a ``train`` kwarg
    (SwiGLU, LayerNorm, ...)."""
    xs = [jnp.asarray(np.random.RandomState(i).rand(*s), dtype)
          for i, s in enumerate(shapes)]
    arg = xs[0] if len(xs) == 1 else list(xs)
    tkw = {"train": False} if takes_train else {}
    variables = module.init(jax.random.PRNGKey(0), arg, *extra_args, **tkw)
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    def loss(params, xs):
        arg = xs[0] if len(xs) == 1 else list(xs)
        kw = {"train": train} if takes_train else {}
        out = module.apply({"params": params, "batch_stats": bs}, arg,
                           *extra_args, mutable=["batch_stats"], **kw)[0]
        return tree_sum(out)

    if backward:
        vg = jax.value_and_grad(loss, argnums=(0, 1))

        def body(carry, _):
            perturbed = [x + (carry * 1e-6).astype(x.dtype) for x in xs]
            val, grads = vg(params, perturbed)
            return val + tree_sum(grads) * 1e-20, None  # anti-DCE
    else:
        def body(carry, _):
            perturbed = [x + (carry * 1e-6).astype(x.dtype) for x in xs]
            return loss(params, perturbed), None

    return _run_scan(body, iters)


def time_grad_fn(fn, *args, iters=ITERS):
    """fwd+bwd ms of a pure function of its array args."""

    def loss(*a):
        return tree_sum(fn(*a))

    vg = jax.value_and_grad(loss, argnums=tuple(range(len(args))))

    def body(carry, _):
        perturbed = tuple(a + (carry * 1e-6).astype(a.dtype) for a in args)
        val, grads = vg(*perturbed)
        return val + tree_sum(grads) * 1e-20, None  # anti-DCE

    return _run_scan(body, iters)
