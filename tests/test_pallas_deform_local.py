"""Pallas dense-local deformable sampling kernel (interpret mode on CPU;
equal to the XLA path up to f32 accumulation-order noise;
Mosaic lowering + speed measured on TPU, see BENCH_NOTES.md)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.ops.deform import deform_dense_local
from iseg_tpu.ops.pallas import deform_local


def _data(b=2, hw=8, c=4, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.rand(b, hw, hw, c), jnp.float32)
    off = jnp.asarray(rs.uniform(-3, 3, (b, hw, hw, 9, 2)), jnp.float32)
    mod = jnp.asarray(rs.rand(b, hw, hw, 9), jnp.float32)
    return x, off, mod


def test_kernel_matches_xla_exactly():
    x, off, mod = _data()
    want = deform_dense_local(x, off, mod, kernel_size=3, max_offset=2)
    got = deform_local._dense_local_pallas_impl(x, off, mod, 3, 2,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=1e-6, atol=1e-6)


def test_kernel_channel_blocking_path():
    # force the channel-blocked path by a channel count > 1 block
    x, off, mod = _data(b=1, hw=8, c=8)
    want = deform_dense_local(x, off, mod)
    got = deform_local._dense_local_pallas_impl(x, off, mod, 3, 2,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=1e-6, atol=1e-6)


def test_custom_vjp_matches_xla_grads(monkeypatch):
    # route the fwd through interpret mode so the public custom-vjp entry
    # point is exercised end to end on CPU
    monkeypatch.setattr(
        deform_local, "_dense_local_pallas_impl",
        functools.partial(deform_local._dense_local_pallas_impl,
                          interpret=True))

    x, off, mod = _data(b=1, hw=6, c=4, seed=3)

    def loss_pl(x, off, mod):
        return jnp.sum(deform_local.deform_dense_local_pallas(
            x, off, mod, 3, 2) ** 2)

    def loss_xla(x, off, mod):
        return jnp.sum(deform_dense_local(x, off, mod, 3, 2) ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(x, off, mod)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(x, off, mod)
    for a, b in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
