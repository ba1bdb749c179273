"""Numeric guards and stabilized ops.

Parity with the reference's ``utils/op_utils.py`` (``safed_softmax`` :24,
``replace_nan`` :42, ``guard_grads`` :62, ``l2_normalize`` :75) and the
leveled ``check_numerics`` of ``utils/value_check.py:5-21``.

TPU-first notes: all guards are pure jittable functions. ``check_numerics``
uses ``jax.debug.print`` (level 1) so it stays inside the compiled program
with no host sync on the hot path; level 2 additionally scrubs non-finite
values so training can continue deterministically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LARGE_NEGATIVE = -1e9

# Global check level, mirroring the reference's module-level level switch
# (``utils/value_check.py:5``). 0 = off, 1 = report, 2 = report + scrub.
_CHECK_NUMERICS_LEVEL = 0


def set_check_numerics_level(level: int) -> None:
    """Set the global numeric-check level (0=off, 1=report, 2=report+scrub)."""
    global _CHECK_NUMERICS_LEVEL
    _CHECK_NUMERICS_LEVEL = int(level)


def get_check_numerics_level() -> int:
    return _CHECK_NUMERICS_LEVEL


def check_numerics(x: jax.Array, message: str = "tensor") -> jax.Array:
    """Leveled numeric check (reference ``utils/value_check.py:5``).

    Level 0: identity. Level 1: prints the count of non-finite entries when
    any exist. Level 2: also replaces NaN->0 and +/-Inf with large finite
    values so downstream math stays finite.
    """
    level = _CHECK_NUMERICS_LEVEL
    if level <= 0 or not jnp.issubdtype(x.dtype, jnp.floating):
        return x

    bad = jnp.sum((~jnp.isfinite(x)).astype(jnp.int32))

    def _report(n):
        jax.debug.print(
            "[check_numerics] {msg}: {n} non-finite values", msg=message, n=n
        )

    jax.lax.cond(bad > 0, lambda n: jax.debug.callback(_report, n), lambda n: None, bad)

    if level >= 2:
        x = replace_non_finite(x)
    return x


def replace_nan(x: jax.Array, value: float = 0.0) -> jax.Array:
    """NaN -> value (reference ``utils/op_utils.py:42``)."""
    return jnp.where(jnp.isnan(x), jnp.asarray(value, x.dtype), x)


def replace_non_finite(x: jax.Array, value: float = 0.0) -> jax.Array:
    """NaN -> value, +/-Inf -> finite max/min (reference ``op_utils.py:42-60``)."""
    finfo = jnp.finfo(x.dtype)
    x = jnp.where(jnp.isnan(x), jnp.asarray(value, x.dtype), x)
    x = jnp.where(jnp.isposinf(x), jnp.asarray(finfo.max, x.dtype), x)
    x = jnp.where(jnp.isneginf(x), jnp.asarray(finfo.min, x.dtype), x)
    return x


@jax.custom_vjp
def guard_grads(x: jax.Array) -> jax.Array:
    """Identity fwd; backward pass scrubs NaN/Inf gradients.

    Reference ``utils/op_utils.py:62`` wraps tensors so a single bad gradient
    cannot poison the whole update.
    """
    return x


def _guard_grads_fwd(x):
    return x, None


def _guard_grads_bwd(_, g):
    return (replace_non_finite(g),)


guard_grads.defvjp(_guard_grads_fwd, _guard_grads_bwd)


def safed_softmax(
    logits: jax.Array,
    mask: jax.Array | None = None,
    axis: int = -1,
) -> jax.Array:
    """Masked, numerically-safe softmax (reference ``utils/op_utils.py:24``).

    Masked positions receive a large negative fill before the softmax; rows
    that are fully masked produce zeros (not NaN).
    """
    compute_dtype = logits.dtype
    if mask is not None:
        mask = mask.astype(jnp.bool_)
        logits = jnp.where(mask, logits, jnp.asarray(_LARGE_NEGATIVE, compute_dtype))
    # stable softmax
    m = jax.lax.stop_gradient(jnp.max(logits, axis=axis, keepdims=True))
    unnorm = jnp.exp(logits - m)
    if mask is not None:
        unnorm = jnp.where(mask, unnorm, jnp.zeros_like(unnorm))
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return jnp.where(denom > 0, unnorm / jnp.maximum(denom, 1e-12), jnp.zeros_like(unnorm))


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2 normalization (reference ``utils/op_utils.py:75``)."""
    norm = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(x), axis=axis, keepdims=True), eps))
    return x / norm


def smart_where(cond, a, b):
    """Python-bool-aware where (reference ``utils/common.py:94``)."""
    if isinstance(cond, bool):
        return a if cond else b
    return jnp.where(cond, a, b)
