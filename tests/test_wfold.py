"""W-fold fast path (nn/wfold.py): the folded branch compute must be an
EXACT reformulation — same parameter tree, same outputs (up to fp
summation order), same batch-stats updates, same gradients — of the
plain BasicBlock stack it replaces in HRNet (reference
backbones/hrnet.py:541 runs these branches as plain NHWC convs)."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones.hrnet import HRNet
from iseg_tpu.backbones.resnet import BasicBlock
from iseg_tpu.nn.wfold import (
    WFoldedBasicBlock,
    fold_factor,
    fold_kernel,
    fold_x,
    unfold_x,
)


def test_fold_factor():
    assert fold_factor(48, 128) == 1   # -> 96 lanes
    assert fold_factor(32, 128) == 2   # -> 128 lanes (exact)
    assert fold_factor(96, 64) == 0    # already >= 3/4 utilization
    assert fold_factor(48, 21) == 0    # odd width: cannot fold
    assert fold_factor(32, 6) == 1     # width divisible by 2 but not 4


def test_fold_kernel_conv_equivalence():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 8, 12, 5), jnp.float32)
    w = jnp.asarray(rs.rand(3, 3, 5, 5) - 0.5, jnp.float32)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = conv(x, w)
    for k in (1, 2):
        got = unfold_x(conv(fold_x(x, k), fold_kernel(w, k)), k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def _init_pair(ch, hw):
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(2, hw, hw, ch) - 0.3, jnp.float32)
    plain = BasicBlock(filters=ch, bn_epsilon=1e-3)
    folded = WFoldedBasicBlock(filters=ch, fold=1, bn_epsilon=1e-3)
    vp = plain.init(jax.random.PRNGKey(7), x, train=False)
    vf = folded.init(jax.random.PRNGKey(7), fold_x(x), train=False)
    return x, plain, folded, vp, vf


def test_wfolded_block_param_tree_and_init_match():
    _, _, _, vp, vf = _init_pair(8, 6)
    flat_p = jax.tree_util.tree_flatten_with_path(vp)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(vf)[0]
    assert [p for p, _ in flat_p] == [p for p, _ in flat_f]
    for (path, a), (_, b) in zip(flat_p, flat_f):
        # identical scope path -> identical flax init rng -> same values
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))


def test_wfolded_block_forward_and_stats_match():
    x, plain, folded, vp, _ = _init_pair(8, 6)
    ref, ref_mut = plain.apply(vp, x, train=True, mutable=["batch_stats"])
    got, got_mut = folded.apply(vp, fold_x(x), train=True,
                                mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(unfold_x(got)), np.asarray(ref),
                               atol=1e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref_mut)[0],
        jax.tree_util.tree_flatten_with_path(got_mut)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=str(pa))
    # eval mode (running stats) matches too
    ref_e = plain.apply(vp, x, train=False)
    got_e = folded.apply(vp, fold_x(x), train=False)
    np.testing.assert_allclose(np.asarray(unfold_x(got_e)),
                               np.asarray(ref_e), atol=1e-5)


def test_wfolded_block_gradients_match():
    x, plain, folded, vp, _ = _init_pair(8, 6)

    def loss_plain(params, x):
        out, _ = plain.apply(
            {"params": params, "batch_stats": vp["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.sum(out * out)

    def loss_folded(params, x):
        out, _ = folded.apply(
            {"params": params, "batch_stats": vp["batch_stats"]},
            fold_x(x), train=True, mutable=["batch_stats"])
        return jnp.sum(out * out)

    gp = jax.grad(loss_plain, argnums=(0, 1))(vp["params"], x)
    gf = jax.grad(loss_folded, argnums=(0, 1))(vp["params"], x)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gp)[0],
        jax.tree_util.tree_flatten_with_path(gf)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4, err_msg=str(pa))


def test_hrnet_w_fold_matches_plain_path():
    """Full HRNet forward: w_fold=True (default) vs w_fold=False on the
    same parameters, train and eval mode."""
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    fast = HRNet(width=48, stage_modules=(1, 1, 1, 1), w_fold=True)
    slow = HRNet(width=48, stage_modules=(1, 1, 1, 1), w_fold=False)
    v = slow.init(jax.random.PRNGKey(3), x, train=False)
    v2 = fast.init(jax.random.PRNGKey(3), x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))

    ref = slow.apply(v, x, train=False)
    got = fast.apply(v, x, train=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)

    ref_t, ref_m = slow.apply(v, x, train=True, mutable=["batch_stats"])
    got_t, got_m = fast.apply(v, x, train=True, mutable=["batch_stats"])
    for a, b in zip(ref_t, got_t):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref_m)[0],
        jax.tree_util.tree_flatten_with_path(got_m)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3, err_msg=str(pa))
