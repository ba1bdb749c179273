"""Fused upsample+CE kernel vs the unfused XLA reference (interpret mode on
CPU; the same kernels compile on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.ops.pallas.upsample_ce import (
    _interp_matrix,
    upsample_cross_entropy,
    upsample_cross_entropy_reference,
)


def _data(n=2, h=4, w=4, c=5, hh=16, ww=16, seed=0, ignore_frac=0.2):
    rng = np.random.RandomState(seed)
    src = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    labels = rng.randint(0, c, (n, hh, ww))
    labels = np.where(rng.rand(n, hh, ww) < ignore_frac, 255, labels)
    return src, jnp.asarray(labels, jnp.int32)


def test_interp_matrix_matches_jax_resize():
    rng = np.random.RandomState(0)
    x = rng.rand(8, 3).astype(np.float32)
    m = _interp_matrix(32, 8)
    ours = m @ x
    ref = np.asarray(jax.image.resize(jnp.asarray(x), (32, 3), "linear"))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # rows are convex combinations
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_fused_matches_reference_forward():
    src, labels = _data()
    fused = upsample_cross_entropy(src, labels, interpret=True)
    ref = upsample_cross_entropy_reference(src, labels)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


def test_fused_matches_reference_gradient():
    src, labels = _data(n=1, h=4, w=4, hh=8, ww=8)

    g_fused = jax.grad(
        lambda s: upsample_cross_entropy(s, labels, interpret=True)
    )(src)
    g_ref = jax.grad(
        lambda s: upsample_cross_entropy_reference(s, labels)
    )(src)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_fused_all_ignored():
    src, _ = _data()
    labels = jnp.full((2, 16, 16), 255, jnp.int32)
    out = upsample_cross_entropy(src, labels, interpret=True)
    assert float(out) == 0.0
    g = jax.grad(lambda s: upsample_cross_entropy(s, labels, interpret=True))(src)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_fused_non_square_and_odd_tiles():
    src, labels = _data(n=1, h=4, w=8, hh=12, ww=24)
    fused = upsample_cross_entropy(src, labels, interpret=True)
    ref = upsample_cross_entropy_reference(src, labels)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


def test_fused_bf16_inputs():
    src, labels = _data()
    fused = upsample_cross_entropy(src.astype(jnp.bfloat16), labels, interpret=True)
    ref = upsample_cross_entropy_reference(src.astype(jnp.bfloat16), labels)
    np.testing.assert_allclose(float(fused), float(ref), rtol=2e-2)
