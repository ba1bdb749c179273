"""Deformable conv tests: bilinear gather math, DCNv2/v3 layers,
FAPN / NAS-FPN heads."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.ops.deform import bilinear_gather, deform_im2col


def test_bilinear_gather_integer_coords_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 5, 6, 3), jnp.float32)
    coords = jnp.array([[[2.0, 3.0], [0.0, 0.0], [4.0, 5.0]]])
    out = np.asarray(bilinear_gather(x, coords))
    np.testing.assert_allclose(out[0, 0], np.asarray(x)[0, 2, 3], rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], np.asarray(x)[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], np.asarray(x)[0, 4, 5], rtol=1e-6)


def test_bilinear_gather_midpoint():
    x = jnp.zeros((1, 2, 2, 1)).at[0, 0, 0, 0].set(1.0).at[0, 1, 1, 0].set(3.0)
    out = np.asarray(bilinear_gather(x, jnp.array([[[0.5, 0.5]]])))
    np.testing.assert_allclose(out[0, 0, 0], (1.0 + 0 + 0 + 3.0) / 4, rtol=1e-6)


def test_bilinear_gather_out_of_bounds_zero():
    x = jnp.ones((1, 4, 4, 2))
    coords = jnp.array([[[-5.0, 0.0], [0.0, 10.0], [-1.0, -1.0]]])
    out = np.asarray(bilinear_gather(x, coords))
    np.testing.assert_allclose(out, 0.0)


def test_deform_im2col_zero_offsets_is_im2col():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 6, 6, 2), jnp.float32)
    offsets = jnp.zeros((1, 6, 6, 9, 2))
    taps = np.asarray(deform_im2col(x, offsets, kernel_size=3))
    assert taps.shape == (1, 6, 6, 9, 2)
    # center tap (index 4) == the input itself
    np.testing.assert_allclose(taps[0, :, :, 4], np.asarray(x)[0], rtol=1e-5)
    # top-left tap at position (1,1) == input (0,0)
    np.testing.assert_allclose(taps[0, 1, 1, 0], np.asarray(x)[0, 0, 0], rtol=1e-5)
    # border: out-of-bounds taps are zero
    np.testing.assert_allclose(taps[0, 0, 0, 0], 0.0)


def test_dcnv2_matches_dense_conv_at_init():
    """Zero-init offsets + sigmoid(0)=0.5 mask -> DCNv2 == 0.5 * conv."""
    from iseg_tpu.nn.dcn import DCNv2

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 8, 8, 4), jnp.float32)
    layer = DCNv2(filters=6, kernel_size=3)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == (1, 8, 8, 6)

    # compare against lax conv with the same kernel (reshaped), halved
    kernel = np.asarray(variables["params"]["kernel"]).reshape(3, 3, 4, 6)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out)[0, 2:-2, 2:-2],
                               0.5 * np.asarray(ref)[0, 2:-2, 2:-2], rtol=2e-3, atol=1e-4)


def test_dcnv3_shapes_and_finite():
    from iseg_tpu.nn.dcn import DCNv3

    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16), jnp.float32)
    layer = DCNv3(filters=16, groups=4)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_dcnv2_gradients_flow():
    from iseg_tpu.nn.dcn import DCNv2

    x = jnp.asarray(np.random.RandomState(0).rand(1, 6, 6, 3), jnp.float32)
    layer = DCNv2(filters=4)
    variables = layer.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(layer.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # offset conv gradient exists (offsets affect sampling)
    assert np.abs(np.asarray(grads["offset_conv"]["kernel"])).max() > 0


def test_fapn_head():
    from iseg_tpu.nn.heads import FAPN

    eps = [jnp.zeros((1, 32, 32, 8)), jnp.zeros((1, 16, 16, 16)),
           jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 4, 4, 64))]
    head = FAPN(filters=16, num_levels=4)
    variables = head.init(jax.random.PRNGKey(0), eps)
    out = head.apply(variables, eps)
    assert out.shape == (1, 32, 32, 16)


def test_nasfpn_head():
    from iseg_tpu.nn.heads import NASFPN

    eps = [jnp.zeros((1, 32, 32, 8)), jnp.zeros((1, 16, 16, 16)),
           jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 4, 4, 64))]
    head = NASFPN(filters=24)
    variables = head.init(jax.random.PRNGKey(0), eps)
    out = head.apply(variables, eps)
    # finest NAS-FPN level = P3 = endpoints[-3] resolution
    assert out.shape == (1, 16, 16, 24)
    assert np.isfinite(np.asarray(out)).all()
