"""Swin Transformer tests: window ops round-trip, masks, full model."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones import get_backbone
from iseg_tpu.backbones.swin import (
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)


def test_window_partition_reverse_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 12, 5), jnp.float32)
    w = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 4, 4, 5)
    back = window_reverse(w, 4, 8, 12)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = _relative_position_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25  # (2*3-1)^2
    # symmetric pairs map to mirrored offsets: diag is the center index
    assert (np.diagonal(idx) == idx[0, 0]).all()


def test_shift_mask_blocks_cross_region():
    mask = _shift_attn_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    assert (mask == 0).any() and (mask == -100).any()
    # unshifted top-left window: fully visible
    np.testing.assert_allclose(mask[0], 0.0)


def test_swin_tiny_endpoints():
    bb = get_backbone("swin_tiny")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    eps = bb.apply(variables, jnp.zeros((1, 64, 64, 3)))
    # first endpoint = patch embedding pre-blocks (reference swin.py:609)
    assert [e.shape[1] for e in eps] == [16, 16, 8, 4, 2]
    assert [e.shape[-1] for e in eps] == [96, 96, 192, 384, 768]


def test_swin_handles_non_multiple_window_sizes():
    # 48x48 at os32 = 1.5 -> internal padding paths must handle it; also
    # stage resolutions (12, 6, 3) are not multiples of window 7
    bb = get_backbone("swin_tiny")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))
    eps = bb.apply(variables, jnp.zeros((1, 48, 48, 3)))
    assert eps[-1].shape[1:3] == (2, 2)
    assert np.isfinite(np.asarray(eps[-1])).all()


def test_swin_train_mode_with_droppath():
    bb = get_backbone("swin_tiny", drop_path_rate=0.5)
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    eps = bb.apply(
        variables, jnp.ones((2, 32, 32, 3)), train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(np.asarray(eps[-1])).all()
