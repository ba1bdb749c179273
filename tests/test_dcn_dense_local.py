"""Gather-free dense-local deformable sampling: exact equivalence with the
gather path for in-range offsets."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.ops.deform import deform_dense_local, deform_im2col


def _ref_sample(x, offsets, modulation, k=3):
    taps = deform_im2col(x, offsets, kernel_size=k)
    return jnp.einsum("bhwtc,bhwt->bhwc", taps, modulation)


def test_dense_local_matches_gather_in_range():
    rng = np.random.RandomState(0)
    b, h, w, c, kk = 2, 10, 12, 4, 9
    x = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    # offsets within +-2 -> clamp inactive -> must match exactly
    offsets = jnp.asarray(rng.uniform(-2, 2, (b, h, w, kk, 2)), jnp.float32)
    modulation = jnp.asarray(rng.rand(b, h, w, kk), jnp.float32)

    ref = _ref_sample(x, offsets, modulation)
    fast = deform_dense_local(x, offsets, modulation, max_offset=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dense_local_zero_offsets_is_modulated_conv_sum():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 6, 6, 2), jnp.float32)
    offsets = jnp.zeros((1, 6, 6, 9, 2))
    modulation = jnp.asarray(rng.rand(1, 6, 6, 9), jnp.float32)
    ref = _ref_sample(x, offsets, modulation)
    fast = deform_dense_local(x, offsets, modulation)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_dense_local_clamps_out_of_range():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 8, 8, 2), jnp.float32)
    big = jnp.full((1, 8, 8, 9, 2), 5.0)  # beyond max_offset=2
    modulation = jnp.ones((1, 8, 8, 9)) / 9.0
    clamped_ref = _ref_sample(x, jnp.clip(big, -2, 2), modulation)
    fast = deform_dense_local(x, big, modulation, max_offset=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(clamped_ref),
                               rtol=1e-5, atol=1e-5)


def test_dcnv3_dense_local_mode():
    # dense_local is the gather-free fast path of the CENTERED semantics;
    # the default "gather" mode is reference-exact (half-pixel base grid,
    # layers/dcn_v3/op.py:16) and intentionally differs — see
    # nn.dcn.DCNv3.sampling
    from iseg_tpu.nn.dcn import DCNv3

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 8, 16), jnp.float32)
    gather = DCNv3(filters=16, groups=4, sampling="gather_centered")
    fast = DCNv3(filters=16, groups=4, sampling="dense_local")
    variables = gather.init(jax.random.PRNGKey(0), x)
    # same params: zero-init offsets are in range -> identical outputs
    a = gather.apply(variables, x)
    b = fast.apply(variables, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    # gradients flow in dense_local mode
    g = jax.grad(lambda p: jnp.sum(fast.apply({"params": p}, x) ** 2))(
        variables["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_intern_image_dense_local_runs():
    from iseg_tpu.backbones import get_backbone

    bb = get_backbone("intern_image_tiny", dcn_sampling="dense_local")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    eps = bb.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert eps[-1].shape == (1, 2, 2, 512)
    assert np.isfinite(np.asarray(eps[-1])).all()


def test_dense_local_taps_match_gather():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 9, 11, 3), jnp.float32)
    offsets = jnp.asarray(rng.uniform(-2, 2, (1, 9, 11, 9, 2)), jnp.float32)
    from iseg_tpu.ops.deform import deform_dense_local_taps

    ref = deform_im2col(x, offsets, kernel_size=3)
    fast = deform_dense_local_taps(x, offsets, max_offset=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dcnv2_dense_local_mode():
    from iseg_tpu.nn.dcn import DCNv2

    x = jnp.asarray(np.random.RandomState(4).rand(1, 8, 8, 4), jnp.float32)
    gather = DCNv2(filters=6, sampling="gather")
    fast = DCNv2(filters=6, sampling="dense_local")
    variables = gather.init(jax.random.PRNGKey(0), x)
    a = gather.apply(variables, x)
    b = fast.apply(variables, x)
    # zero-init offsets -> in range -> identical
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_dense_local_ref_matches_reference_gather():
    """dense_local_ref (gather-free, transposed-plane) must be EXACT vs the
    reference-semantics sampler for in-range offsets (VERDICT #4: a path
    exact for pretrained weights at dense-local speed)."""
    from iseg_tpu.ops.deform import (
        dcnv3_ref_effective_offsets,
        dcnv3_sample_ref,
        deform_dense_local,
    )

    rng = np.random.RandomState(3)
    b, h, w, c, kk = 2, 12, 12, 4, 9
    x = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    offsets = jnp.asarray(rng.uniform(-1.5, 1.5, (b, h, w, kk, 2)), jnp.float32)
    mask = jnp.asarray(rng.rand(b, h, w, kk), jnp.float32)

    exact = dcnv3_sample_ref(x, offsets, mask, kernel_size=3)
    eff = dcnv3_ref_effective_offsets(offsets, h, w, kernel_size=3)
    # effective offsets stay well inside the clamp for these inputs
    assert float(jnp.abs(eff).max()) < 4.0
    fast = deform_dense_local(x.transpose(0, 2, 1, 3), eff, mask,
                              kernel_size=3, max_offset=4)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-5, atol=2e-5)


def test_dcnv3_auto_mode_matches_gather():
    from iseg_tpu.nn.dcn import DCNv3

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 8, 8, 16), jnp.float32)
    exact = DCNv3(filters=16, groups=4, sampling="gather")
    auto = DCNv3(filters=16, groups=4, sampling="auto", max_local_offset=4)
    variables = exact.init(jax.random.PRNGKey(0), x)
    a = exact.apply(variables, x)
    b = auto.apply(variables, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)

    # non-square map: auto falls back to the exact gather path
    xr = jnp.asarray(rng.rand(2, 8, 12, 16), jnp.float32)
    vr = exact.init(jax.random.PRNGKey(0), xr)
    np.testing.assert_allclose(
        np.asarray(exact.apply(vr, xr)), np.asarray(auto.apply(vr, xr)),
        rtol=2e-5, atol=2e-5)


def test_calibrate_dcn_sampling_reports_layers():
    """calibrate_dcn_sampling measures per-layer effective-offset bounds
    and recommends the smallest exact dense-local clamp (VERDICT #4)."""
    from iseg_tpu.nn.dcn import DCNv3, calibrate_dcn_sampling

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 8, 16), jnp.float32)
    layer = DCNv3(filters=16, groups=4, sampling="auto")
    variables = layer.init(jax.random.PRNGKey(0), x)
    report = calibrate_dcn_sampling(layer, variables, x)
    assert len(report) == 1
    (stats,) = report.values()
    # zero-init offset head -> effective offsets are just the sub-pixel
    # base-grid shifts, well under 2 px
    assert 0.0 <= stats["max_offset_mag"] < 2.0
    assert stats["recommended_sampling"] == "dense_local_ref"
    assert stats["recommended_r"] >= 1

    # inflate the offset head bias -> magnitude grows -> gather recommended
    import flax
    flat = flax.traverse_util.flatten_dict(variables["params"])
    for path in flat:
        if "offset_head" in path and path[-1] == "bias":
            flat[path] = flat[path] + 50.0
    big = {"params": flax.traverse_util.unflatten_dict(flat)}
    report2 = calibrate_dcn_sampling(layer, big, x)
    (stats2,) = report2.values()
    assert stats2["max_offset_mag"] > stats["max_offset_mag"]
    assert stats2["recommended_sampling"] == "gather"


def test_calibrate_on_backbone():
    from iseg_tpu.backbones.intern_image import InternImage
    from iseg_tpu.nn.dcn import calibrate_dcn_sampling

    bb = InternImage(channels=16, depths=(1, 1), groups=(2, 4),
                     dcn_sampling="auto")
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), x)
    report = calibrate_dcn_sampling(bb, variables, x)
    assert len(report) == 2  # one DCNv3 per block
    for stats in report.values():
        assert stats["recommended_sampling"] == "dense_local_ref"


# ---------------------------------------------- grouped-flat path (round 5)
#
# The fold-free formulation (ops/deform.py::dense_local_flat +
# deform_dense_local_grouped): values stay [B,H,W,G*gc], displacement maps
# ride flat-minor [B,H,W,G*KK], the group reduce+broadcast is one constant
# block-diagonal matmul. Must equal the folded [B*G,...] path to f32
# matmul-reassociation noise (probe_internimage: the folded path's
# deferred relayouts de-fuse the displacement loop in-module on TPU).


def _fold(x, off, mod, g):
    b, h, w, c = x.shape
    gc = c // g
    kk = off.shape[4]
    vg = x.reshape(b, h, w, g, gc).transpose(0, 3, 1, 2, 4)
    vg = vg.reshape(b * g, h, w, gc)
    off_b = off.transpose(0, 3, 1, 2, 4, 5).reshape(b * g, h, w, kk, 2)
    mod_b = mod.transpose(0, 3, 1, 2, 4).reshape(b * g, h, w, kk)
    return vg, off_b, mod_b


def _unfold(out, b, g):
    bg, h, w, gc = out.shape
    return out.reshape(b, g, h, w, gc).transpose(0, 2, 3, 1, 4).reshape(
        b, h, w, g * gc)


def test_dense_local_grouped_matches_folded():
    from iseg_tpu.ops.deform import deform_dense_local_grouped

    rng = np.random.RandomState(3)
    b, h, w, g, gc, kk = 2, 12, 12, 4, 5, 9
    x = jnp.asarray(rng.randn(b, h, w, g * gc), jnp.float32)
    off = jnp.asarray(rng.uniform(-3, 3, (b, h, w, g, kk, 2)), jnp.float32)
    mod = jnp.asarray(rng.rand(b, h, w, g, kk), jnp.float32)

    vg, off_b, mod_b = _fold(x, off, mod, g)
    want = _unfold(deform_dense_local(vg, off_b, mod_b, 3, 2), b, g)
    got = deform_dense_local_grouped(x, off, mod, 3, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ref_effective_offsets_grouped_matches_folded():
    from iseg_tpu.ops.deform import (
        dcnv3_ref_effective_offsets,
        dcnv3_ref_effective_offsets_grouped,
    )

    rng = np.random.RandomState(4)
    b, h, w, g, kk = 2, 10, 10, 4, 9
    off = jnp.asarray(rng.uniform(-2, 2, (b, h, w, g, kk, 2)), jnp.float32)
    off_b = off.transpose(0, 3, 1, 2, 4, 5).reshape(b * g, h, w, kk, 2)

    want = dcnv3_ref_effective_offsets(off_b, h, w, 3, 0.7)
    edy, edx = dcnv3_ref_effective_offsets_grouped(off, h, w, 3, 0.7)
    edy_f = edy.reshape(b, h, w, g, kk).transpose(0, 3, 1, 2, 4).reshape(
        b * g, h, w, kk)
    edx_f = edx.reshape(b, h, w, g, kk).transpose(0, 3, 1, 2, 4).reshape(
        b * g, h, w, kk)
    np.testing.assert_allclose(np.asarray(edy_f), np.asarray(want[..., 0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(edx_f), np.asarray(want[..., 1]),
                               rtol=1e-6, atol=1e-6)


def test_dense_local_flat_ref_mode_matches_folded():
    from iseg_tpu.ops.deform import (
        dcnv3_ref_effective_offsets,
        dcnv3_ref_effective_offsets_grouped,
        dense_local_flat,
    )

    rng = np.random.RandomState(5)
    b, h, w, g, gc, kk = 2, 12, 12, 4, 5, 9
    x = jnp.asarray(rng.randn(b, h, w, g * gc), jnp.float32)
    off = jnp.asarray(rng.uniform(-1, 1, (b, h, w, g, kk, 2)), jnp.float32)
    mod = jnp.asarray(rng.rand(b, h, w, g, kk), jnp.float32)

    vg, off_b, mod_b = _fold(x, off, mod, g)
    eff = dcnv3_ref_effective_offsets(off_b, h, w, 3, 1.0)
    want = _unfold(
        deform_dense_local(vg.transpose(0, 2, 1, 3), eff, mod_b, 3, 4), b, g)

    edy, edx = dcnv3_ref_effective_offsets_grouped(off, h, w, 3, 1.0)
    got = dense_local_flat(
        x.transpose(0, 2, 1, 3), edy, edx, mod.reshape(b, h, w, g * kk),
        g, 3, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dense_local_flat_gradients_match_folded():
    from iseg_tpu.ops.deform import deform_dense_local_grouped

    rng = np.random.RandomState(6)
    b, h, w, g, gc, kk = 1, 8, 8, 2, 4, 9
    x = jnp.asarray(rng.randn(b, h, w, g * gc), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (b, h, w, g, kk, 2)), jnp.float32)
    mod = jnp.asarray(rng.rand(b, h, w, g, kk), jnp.float32)

    def loss_folded(x, off, mod):
        vg, off_b, mod_b = _fold(x, off, mod, g)
        return jnp.sum(deform_dense_local(vg, off_b, mod_b, 3, 2) ** 2)

    def loss_grouped(x, off, mod):
        return jnp.sum(deform_dense_local_grouped(x, off, mod, 3, 2) ** 2)

    gw = jax.grad(loss_folded, argnums=(0, 1, 2))(x, off, mod)
    gg = jax.grad(loss_grouped, argnums=(0, 1, 2))(x, off, mod)
    for a, b_ in zip(gw, gg):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
