import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.backbones import get_backbone


def _run(bb, hw=64, n=1):
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((n, hw, hw, 3)))
    return bb.apply(variables, jnp.zeros((n, hw, hw, 3))), variables


def test_resnet18_endpoints():
    bb = get_backbone("resnet18", output_stride=32)
    eps, _ = _run(bb)
    assert [e.shape[1] for e in eps] == [32, 16, 8, 4, 2]
    assert eps[-1].shape[-1] == 512


def test_resnet50_bottleneck_channels():
    bb = get_backbone("resnet9")  # tiny stand-in for stack behavior
    eps, _ = _run(bb)
    assert eps[-1].shape[-1] == 512  # basic block: 512

    bb50 = get_backbone("resnet50")
    variables = bb50.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    eps50 = bb50.apply(variables, jnp.zeros((1, 32, 32, 3)))
    assert eps50[-1].shape[-1] == 2048


def test_resnet_output_stride_16_dilation():
    bb = get_backbone("resnet9", output_stride=16)
    eps, _ = _run(bb)
    # last stage dilated: final endpoint stays at os16 spatial size
    assert eps[-1].shape[1] == 4
    # endpoint count shrinks by one downsample boundary
    assert [e.shape[1] for e in eps] == [32, 16, 8, 4, 4]


def test_resnet_output_stride_8():
    bb = get_backbone("resnet9", output_stride=8)
    eps, _ = _run(bb)
    assert eps[-1].shape[1] == 8


def test_resnet_deep_stem_param_names():
    bb = get_backbone("resnet10")
    _, variables = _run(bb, hw=32)
    assert "stem0" in variables["params"]
    assert "stem" not in variables["params"]


def test_aspp_head_with_resnet():
    from iseg_tpu.core.model import SegManaged
    from iseg_tpu.nn.heads import ASPP

    model = SegManaged(
        num_class=4,
        backbone=get_backbone("resnet9", output_stride=16),
        head=ASPP(filters=32),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 64, 64, 4)


def test_aspp_separable():
    from iseg_tpu.nn.heads import ASPP

    head = ASPP(filters=16, use_separable_conv=True)
    x = [jnp.zeros((1, 8, 8, 32))]
    variables = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(variables, x)
    assert out.shape == (1, 8, 8, 16)
