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

    # reference semantics (fpn.py:44-60): the coarsest endpoint passes
    # through RAW, so it must already carry ``filters`` channels
    eps = [jnp.zeros((1, 32, 32, 16)), jnp.zeros((1, 16, 16, 32)),
           jnp.zeros((1, 8, 8, 64)), jnp.zeros((1, 4, 4, 24))]
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
    # output at the resolution of endpoints[-3]; 4 dilation branches of
    # ``width`` channels each concat to 4*width (reference jpu.py:38-90)
    assert out.shape == (1, 16, 16, 4 * 32)


def test_pyramid_heads_select_by_resolution_for_hrnet():
    """HRNet's endpoints end with the os4 HRNetV2 concat (reference order,
    hrnet.py:535-536); pyramid heads must select the coarsest DISTINCT
    strides, not the positional tail (which would treat the os4 concat as
    the coarsest level)."""
    import jax
    import jax.numpy as jnp

    from iseg_tpu.nn.heads.common import select_pyramid_endpoints

    # fake HRNet endpoint list: os4, os8, os16, os32 branches + os4 concat
    n = 1
    eps = [jnp.zeros((n, 16, 16, 8)), jnp.zeros((n, 8, 8, 16)),
           jnp.zeros((n, 4, 4, 32)), jnp.zeros((n, 2, 2, 64)),
           jnp.zeros((n, 16, 16, 120))]
    sel = select_pyramid_endpoints(eps, 3)
    assert [tuple(s.shape[1:3]) for s in sel] == [(8, 8), (4, 4), (2, 2)]
    # ties at one resolution keep the LAST (the richer concat)
    sel4 = select_pyramid_endpoints(eps, 4)
    assert sel4[0].shape[-1] == 120

    # standard fine->coarse lists are unchanged vs the positional tail
    std = [jnp.zeros((n, 16, 16, 8)), jnp.zeros((n, 8, 8, 16)),
           jnp.zeros((n, 4, 4, 32)), jnp.zeros((n, 2, 2, 64))]
    assert select_pyramid_endpoints(std, 3) == std[-3:]

    # end-to-end: HRNet + JPU compiles and the fused map is os8-sized
    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.nn.heads import JPU

    bb = get_backbone("hrnet_w32")
    x = jnp.zeros((1, 64, 64, 3))
    vs = bb.init(jax.random.PRNGKey(0), x)
    eps = bb.apply(vs, x, train=False)
    head = JPU(filters=32)
    hv = head.init(jax.random.PRNGKey(1), eps)
    out = head.apply(hv, eps, train=False)
    assert out.shape[1:3] == (8, 8)  # os8, not the os4 concat's resolution
