"""Tests for Xception / EfficientNet backbones and FPN / JPU heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.backbones import get_backbone


def _endpoints(bb, hw=64):
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)))
    return bb.apply(variables, jnp.zeros((1, hw, hw, 3)))


def test_xception65_endpoints():
    bb = get_backbone("xception65", output_stride=32)
    eps = _endpoints(bb)
    # two os2 endpoints: after block1_conv1 and pre-block2 (reference
    # xception_common.py:180-195)
    assert [e.shape[1] for e in eps] == [32, 32, 16, 8, 4, 2]
    assert eps[-1].shape[-1] == 2048


def test_xception65_output_stride_16():
    bb = get_backbone("xception65", output_stride=16)
    eps = _endpoints(bb)
    assert eps[-1].shape[1] == 4  # exit stays at os16


def test_efficientnetb0_endpoints():
    bb = get_backbone("efficientnetb0", output_stride=32)
    eps = _endpoints(bb)
    assert [e.shape[1] for e in eps] == [32, 16, 8, 4, 2]
    assert eps[-1].shape[-1] == 1280  # top_conv endpoint (reference :362-367)


def test_efficientnetb2_width_scaling():
    bb = get_backbone("efficientnetb2", output_stride=16)
    eps = _endpoints(bb, hw=32)
    # b2 width 1.1: 320 -> 352; os16 keeps 32/16=2
    assert eps[-1].shape[1:] == (2, 2, 1408)  # top_conv = 1280 * width 1.1


def test_fpn_pyramid():
    from iseg_tpu.nn.heads.fpn import FeaturePyramidNetwork

    eps = [jnp.zeros((1, 32, 32, 16)), jnp.zeros((1, 16, 16, 32)),
           jnp.zeros((1, 8, 8, 64)), jnp.zeros((1, 4, 4, 128))]
    head = FeaturePyramidNetwork(filters=24, num_levels=4)
    variables = head.init(jax.random.PRNGKey(0), eps)
    outs = head.apply(variables, eps)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 24), (1, 16, 16, 24), (1, 8, 8, 24), (1, 4, 4, 24)]


def test_semantic_fpn_fuses_to_finest():
    from iseg_tpu.nn.heads.fpn import SemanticFPN

    eps = [jnp.zeros((1, 32, 32, 16)), jnp.zeros((1, 16, 16, 32)),
           jnp.zeros((1, 8, 8, 64)), jnp.zeros((1, 4, 4, 128))]
    head = SemanticFPN(filters=24, fuse_filters=12, num_levels=4)
    variables = head.init(jax.random.PRNGKey(0), eps)
    out = head.apply(variables, eps)
    assert out.shape == (1, 32, 32, 12)


def test_jpu_head():
    from iseg_tpu.nn.heads.jpu import JointPyramidUpsampling

    eps = [jnp.zeros((1, 32, 32, 16)), jnp.zeros((1, 16, 16, 32)),
           jnp.zeros((1, 8, 8, 64)), jnp.zeros((1, 4, 4, 128))]
    head = JointPyramidUpsampling(filters=32)
    variables = head.init(jax.random.PRNGKey(0), eps)
    out = head.apply(variables, eps)
    # output at the resolution of endpoints[-3], channels = 4 branches
    assert out.shape == (1, 16, 16, (32 // 4 * 2) * 4)
