import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.backbones import get_backbone, list_backbones
from iseg_tpu.core.inference import (
    inference_with_multi_scales,
    inference_with_sliding_window,
    sliding_start_indices,
    sliding_window_plan,
)
from iseg_tpu.core.model import SegManaged
from iseg_tpu.nn.heads import SimpleDecoder


@pytest.fixture(scope="module")
def mbv2_model():
    model = SegManaged(
        num_class=5,
        backbone=get_backbone("mobilenetv2", output_stride=32, width_multiplier=0.5),
        head=SimpleDecoder(filters=32, low_level_filters=8),
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables


def test_backbone_registry():
    assert "mobilenetv2" in list_backbones()
    with pytest.raises(KeyError):
        get_backbone("nope")


def test_mobilenetv2_endpoints_strides():
    bb = get_backbone("mobilenetv2", output_stride=32, width_multiplier=0.5)
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    eps = bb.apply(variables, jnp.zeros((1, 64, 64, 3)))
    sizes = [e.shape[1] for e in eps]
    assert sizes == [32, 16, 8, 4, 2]  # os 2,4,8,16,32


def test_mobilenetv2_output_stride_16():
    bb = get_backbone("mobilenetv2", output_stride=16, width_multiplier=0.5)
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    eps = bb.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert eps[-1].shape[1] == 4  # final feature stays at os16


def test_mobilenetv2_input_size_free():
    bb = get_backbone("mobilenetv2", output_stride=32, width_multiplier=0.5)
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    eps = bb.apply(variables, jnp.zeros((2, 96, 128, 3)))
    assert eps[-1].shape == (2, 3, 4, eps[-1].shape[-1])


def test_segmanaged_forward(mbv2_model):
    model, variables = mbv2_model
    logits = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert logits.shape == (2, 64, 64, 5)
    assert logits.dtype == jnp.float32


def test_segmanaged_train_mode_updates_batch_stats(mbv2_model):
    model, variables = mbv2_model
    out, mutated = model.apply(
        variables,
        jnp.ones((2, 64, 64, 3)),
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert "batch_stats" in mutated
    # running stats actually moved
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_segmanaged_aux_outputs():
    model = SegManaged(
        num_class=3,
        num_aux_loss=1,
        use_aux_head_endpoints=True,
        backbone=get_backbone("mobilenetv2", output_stride=32, width_multiplier=0.5),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert set(out) == {"output_0", "output_1"}
    assert out["output_0"].shape == (1, 64, 64, 3)
    assert out["output_1"].shape == (1, 64, 64, 3)


def test_loss_fn_builder():
    model = SegManaged(num_class=3, num_aux_loss=1, aux_loss_rate=0.5)
    loss_fn = model.build_loss_fn()
    outputs = {
        "output_0": jnp.zeros((1, 8, 8, 3)),
        "output_1": jnp.zeros((1, 8, 8, 3)),
    }
    labels = jnp.zeros((1, 8, 8), jnp.int32)
    total, parts = loss_fn(outputs, labels)
    expected_single = float(parts["output_0_loss"])
    np.testing.assert_allclose(float(total), expected_single * 1.5, rtol=1e-5)


def test_sliding_start_indices():
    assert sliding_start_indices(10, 10, 5) == [0]
    assert sliding_start_indices(10, 20, 5) == [0]
    assert sliding_start_indices(10, 4, 3) == [0, 3, 6]
    assert sliding_start_indices(11, 4, 3) == [0, 3, 6, 7]  # snapped final


def test_sliding_window_plan_counts():
    starts, counts, (wh, ww) = sliding_window_plan((8, 8), (4, 4), stride_rate=0.5)
    assert (wh, ww) == (4, 4)
    assert counts.min() >= 1
    # full coverage, overlaps counted
    assert counts.sum() == len(starts) * wh * ww


def test_sliding_window_equals_direct_for_linear_fn():
    # identity "model": window logits = window pixels -> averaging over
    # overlaps must reconstruct the image exactly
    x = jnp.asarray(np.random.RandomState(0).rand(1, 10, 12, 3), jnp.float32)
    out = inference_with_sliding_window(lambda w: w, x, (6, 6), stride_rate=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_sliding_window_batched_matches_serial():
    # window_batch folds windows into the batch dim; results must match the
    # one-window-per-step sweep exactly (eval forwards are per-sample).
    # 10x12 with 6^2 windows at stride 3 -> 2x3 = 6 windows; wb=4 exercises
    # the zero-weight sentinel padding (6 -> 8).
    x = jnp.asarray(np.random.RandomState(1).rand(2, 10, 12, 3), jnp.float32)

    def fake_model(w):  # per-sample nonlinear "logits"
        return jnp.tanh(w * 2.0 - 1.0) + w**2

    serial = inference_with_sliding_window(fake_model, x, (6, 6), stride_rate=0.5)
    for wb in (2, 3, 4, 16):
        batched = inference_with_sliding_window(
            fake_model, x, (6, 6), stride_rate=0.5, window_batch=wb
        )
        np.testing.assert_allclose(np.asarray(batched), np.asarray(serial), atol=1e-6)


def test_sliding_window_batched_overlap_within_chunk():
    # overlapping windows landing in the SAME chunk must both accumulate
    # (stride 0.5 on 8 wide -> starts 0/2/4, heavy overlap)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 4, 8, 2), jnp.float32)
    serial = inference_with_sliding_window(lambda w: w * 3.0, x, (4, 4), stride_rate=0.5)
    batched = inference_with_sliding_window(
        lambda w: w * 3.0, x, (4, 4), stride_rate=0.5, window_batch=3
    )
    np.testing.assert_allclose(np.asarray(batched), np.asarray(serial), atol=1e-6)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(x) * 3.0, atol=1e-5)


def test_sliding_window_single_window_shortcut():
    x = jnp.ones((1, 4, 4, 2))
    out = inference_with_sliding_window(lambda w: w * 2, x, (8, 8))
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_multi_scale_flip_inference_identity():
    # smooth image: scale down/up round trip is near-lossless, so the
    # multi-scale average of an identity "model" reconstructs the input
    g = np.linspace(0, 1, 16, dtype=np.float32)
    x = jnp.asarray(
        np.broadcast_to(g[None, :, None, None] * g[None, None, :, None], (1, 16, 16, 3))
    )
    out = inference_with_multi_scales(
        lambda w: w, x, scale_rates=(0.5, 1.0), flip=True
    )
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0.05)


def test_flip_in_batch_matches_serial():
    # folding the flip pair into one 2x-batch forward must match the
    # serial two-pass sweep bit-for-bit up to fp reassociation, across
    # scales and with/without a sliding window; the fake model is
    # nonlinear and NOT flip-equivariant (asymmetric spatial ramp).
    x = jnp.asarray(np.random.RandomState(3).rand(2, 12, 16, 3), jnp.float32)

    def fake_model(w):
        ramp = jnp.linspace(0.0, 1.0, w.shape[2])[None, None, :, None]
        return jnp.tanh(w * 2.0 - 1.0) + w**2 * ramp

    for kwargs in (
        dict(scale_rates=(0.5, 1.0), flip=True),
        dict(scale_rates=(1.0,), flip=True,
             sliding_window_crop_size=(8, 8), sliding_window_batch=2),
    ):
        serial = inference_with_multi_scales(fake_model, x, **kwargs)
        paired = inference_with_multi_scales(
            fake_model, x, flip_in_batch=True, **kwargs
        )
        np.testing.assert_allclose(
            np.asarray(paired), np.asarray(serial), atol=1e-5
        )


def test_multi_scale_inference_with_model(mbv2_model):
    model, variables = mbv2_model

    def single(x):
        return model.apply(variables, x, train=False)

    logits = inference_with_multi_scales(
        single, jnp.zeros((1, 64, 64, 3)), scale_rates=(0.5, 1.0), flip=True
    )
    assert logits.shape == (1, 64, 64, 5)


def test_sliding_window_rejects_gapping_stride():
    # stride_rate > 1 leaves pixels no window covers -> 0/0 NaN logits;
    # must refuse loudly instead
    import pytest

    x = jnp.ones((1, 16, 16, 3))
    with pytest.raises(ValueError, match="stride_rate"):
        inference_with_sliding_window(lambda w: w, x, (8, 8), stride_rate=1.5)
