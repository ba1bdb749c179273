"""Deformable multi-head attention tests."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.nn.attention import DeformableMultiHeadAttention2D


def test_shapes_and_residual_at_init():
    layer = DeformableMultiHeadAttention2D(num_heads=4, num_points=2, filters=16)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
    # offsets and weights are zero-init -> sampling at the query position
    # with uniform weights; output = x + proj(value) (a well-defined start)
    offsets = variables["params"]["offsets"]["kernel"]
    np.testing.assert_allclose(np.asarray(offsets), 0.0)


def test_gradients_flow_to_offsets():
    layer = DeformableMultiHeadAttention2D(num_heads=2, num_points=2, filters=8)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 6, 6, 8), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(layer.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    assert all(
        np.isfinite(np.asarray(g)).all()
        for g in jax.tree_util.tree_leaves(grads)
    )
    # offsets receive gradient through the bilinear sampler
    assert np.abs(np.asarray(grads["offsets"]["kernel"])).max() > 0
