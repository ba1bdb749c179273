"""Tests for ConvNeXt, HRNet, ViT, MLP-Mixer backbones + attention layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.backbones import get_backbone


def _endpoints(bb, hw=64, train=False):
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)))
    return bb.apply(variables, jnp.zeros((1, hw, hw, 3)))


def test_convnext_tiny_endpoints():
    bb = get_backbone("convnext_tiny", output_stride=32)
    eps = _endpoints(bb)
    # reference convnext.py:180: leading None placeholder (no os2 feature)
    assert eps[0] is None
    assert [e.shape[1] for e in eps[1:]] == [16, 8, 4, 2]  # os 4/8/16/32
    assert [e.shape[-1] for e in eps[1:]] == [96, 192, 384, 768]


def test_convnext_dilated_os16():
    bb = get_backbone("convnext_tiny", output_stride=16)
    eps = _endpoints(bb)
    assert eps[-1].shape[1] == 4  # last stage dilated


def test_convnext_v2_has_grn_no_layerscale():
    bb = get_backbone("convnext_v2_atto")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = variables["params"]
    block = params["stage0_block0"]
    assert "grn" in block
    assert "gamma" not in block  # no layer scale in v2


def test_hrnet_endpoints_and_concat():
    bb = get_backbone("hrnet_w32")
    eps = _endpoints(bb, hw=64)
    # reference hrnet.py:535-536: 4 branches + the os4 concat
    assert [e.shape[1] for e in eps] == [16, 8, 4, 2, 16]
    assert [e.shape[-1] for e in eps] == [32, 64, 128, 256, 32 + 64 + 128 + 256]

    bb2 = get_backbone("hrnet_w32", return_endpoints=False)
    variables = bb2.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = bb2.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 16, 16, 32 + 64 + 128 + 256)


def test_vit_input_size_free():
    bb = get_backbone("vit_base_patch16")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    eps = bb.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert eps[0].shape == (1, 4, 4, 768)
    # same params, different input size (pos-embed resampled)
    eps2 = bb.apply(variables, jnp.zeros((1, 96, 96, 3)))
    assert eps2[0].shape == (1, 6, 6, 768)


def test_vit_sam_has_no_class_token():
    bb = get_backbone("vit_base_patch16_sam")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    assert "cls_token" not in variables["params"]


def test_mlp_mixer():
    bb = get_backbone("mlp_mixer_b16")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    eps = bb.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert eps[0].shape == (1, 4, 4, 768)


def test_placeholder_identity():
    bb = get_backbone("placeholder")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    eps = bb.apply(variables, jnp.ones((1, 8, 8, 3)))
    np.testing.assert_allclose(np.asarray(eps[0]), 1.0)


def test_mhsa_2d():
    from iseg_tpu.nn.attention import MultiHeadSelfAttention2D

    layer = MultiHeadSelfAttention2D(num_heads=4, filters=32)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_axial_attention():
    from iseg_tpu.nn.attention import MultiHeadAxialAttention2D

    layer = MultiHeadAxialAttention2D(num_heads=4, filters=16)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 12, 16), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == (2, 8, 12, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_self_attention_2d_starts_as_identity():
    from iseg_tpu.nn.attention import SelfAttention2D

    layer = SelfAttention2D()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 6, 6, 8), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    # gamma starts at 0 -> identity
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
