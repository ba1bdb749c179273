import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.losses import (
    cross_entropy_ignore_label,
    dice_loss,
    get_ohem_fn,
    mask_loss,
    smooth_l1_loss,
    pixel_contrastive_loss,
)


def _rand_logits_labels(key=0, n=2, h=8, w=8, c=5, ignore_frac=0.2):
    rng = np.random.RandomState(key)
    logits = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    labels = rng.randint(0, c, (n, h, w))
    mask = rng.rand(n, h, w) < ignore_frac
    labels = np.where(mask, 255, labels)
    return logits, jnp.asarray(labels, jnp.int32)


def test_ce_ignore_label_matches_manual():
    logits, labels = _rand_logits_labels()
    loss = cross_entropy_ignore_label(logits, labels, ignore_label=255)

    lp = np.asarray(jax.nn.log_softmax(logits, -1))
    lab = np.asarray(labels)
    valid = lab != 255
    safe = np.where(valid, lab, 0)
    ce = -np.take_along_axis(lp, safe[..., None], -1)[..., 0]
    expected = (ce * valid).sum() / valid.sum()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_ce_global_batch_reduction_matches_reference_formula():
    # reference catecrossentropy_ignore_label.py:85-86: the reduction=True
    # path is sum(weighted pixel CE) / global_batch_size — a CONSTANT
    # denominator independent of ignore coverage.
    logits, labels = _rand_logits_labels()
    loss = cross_entropy_ignore_label(
        logits, labels, ignore_label=255,
        reduction="global_batch", global_batch_size=16,
    )
    lp = np.asarray(jax.nn.log_softmax(logits, -1))
    lab = np.asarray(labels)
    valid = lab != 255
    safe = np.where(valid, lab, 0)
    ce = -np.take_along_axis(lp, safe[..., None], -1)[..., 0]
    expected = (ce * valid).sum() / 16.0
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_ce_global_batch_requires_size():
    logits, labels = _rand_logits_labels()
    try:
        cross_entropy_ignore_label(logits, labels, reduction="global_batch")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_ce_ignore_label_zero_shifts_labels():
    # reference catecrossentropy_ignore_label.py:58-59: ignore_label == 0
    # means real classes are stored 1..C and shifted down by one so class
    # k hits logit channel k-1.
    rng = np.random.RandomState(3)
    c = 4
    logits = jnp.asarray(rng.randn(2, 6, 6, c), jnp.float32)
    labels_np = rng.randint(1, c + 1, (2, 6, 6))
    labels_np[rng.rand(2, 6, 6) < 0.25] = 0  # ignored
    labels = jnp.asarray(labels_np, jnp.int32)

    loss = cross_entropy_ignore_label(logits, labels, num_classes=c, ignore_label=0)

    lp = np.asarray(jax.nn.log_softmax(logits, -1))
    valid = labels_np != 0
    shifted = np.where(valid, labels_np - 1, 0)
    ce = -np.take_along_axis(lp, shifted[..., None], -1)[..., 0]
    expected = (ce * valid).sum() / valid.sum()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_ce_all_ignored_is_finite():
    logits, _ = _rand_logits_labels()
    labels = jnp.full(logits.shape[:3], 255, jnp.int32)
    loss = cross_entropy_ignore_label(logits, labels)
    assert np.isfinite(float(loss))
    assert float(loss) == 0.0


def test_ce_class_weights():
    logits, labels = _rand_logits_labels(c=3)
    base = cross_entropy_ignore_label(logits, labels, num_classes=3)
    doubled = cross_entropy_ignore_label(
        logits, labels, num_classes=3, class_weights=[2.0, 2.0, 2.0]
    )
    # uniform weights cancel in valid_mean reduction
    np.testing.assert_allclose(float(doubled), float(base), rtol=1e-5)


def test_focal_less_than_ce_for_easy_examples():
    # very confident correct predictions -> focal << ce
    labels = jnp.zeros((1, 4, 4), jnp.int32)
    logits = jnp.zeros((1, 4, 4, 3)).at[..., 0].set(10.0)
    ce = cross_entropy_ignore_label(logits, labels)
    focal = cross_entropy_ignore_label(logits, labels, use_focal=True)
    assert float(focal) < float(ce)


def test_ce_label_resize_to_logits():
    logits, _ = _rand_logits_labels(h=8, w=8)
    labels = jnp.zeros((2, 16, 16), jnp.int32)  # larger than logits
    loss = cross_entropy_ignore_label(logits, labels)
    assert np.isfinite(float(loss))


def test_ohem_keeps_hard_pixels():
    ohem = get_ohem_fn(thresh=0.7, min_kept=4)
    losses = jnp.arange(16.0).reshape(4, 4)
    probs = jnp.linspace(0, 1, 16).reshape(4, 4)  # low prob = hard
    mask = jnp.ones((4, 4))
    kept = ohem(losses, probs, mask)
    # pixels with prob < 0.7 kept (more than min_kept -> exactly those)
    expected = (np.asarray(probs) < 0.7).astype(np.float32)
    np.testing.assert_allclose(np.asarray(kept), expected)


def test_ohem_min_kept_fallback():
    ohem = get_ohem_fn(thresh=0.01, min_kept=5)  # almost nothing qualifies
    losses = jnp.asarray(np.random.RandomState(0).rand(4, 4), jnp.float32)
    probs = jnp.ones((4, 4)) * 0.9
    mask = jnp.ones((4, 4))
    kept = ohem(losses, probs, mask)
    assert int(np.asarray(kept).sum()) == 5
    # the kept ones are the highest-loss pixels
    flat = np.asarray(losses).ravel()
    kept_idx = np.where(np.asarray(kept).ravel() > 0)[0]
    assert set(kept_idx) == set(np.argsort(flat)[-5:])


def test_ce_with_ohem_runs():
    logits, labels = _rand_logits_labels()
    loss = cross_entropy_ignore_label(logits, labels, ohem_fn=get_ohem_fn(0.9, 10))
    assert np.isfinite(float(loss))


def test_dice_perfect_prediction_near_zero():
    labels = jnp.zeros((1, 8, 8), jnp.int32)
    logits = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(50.0)
    assert float(dice_loss(logits, labels)) < 0.01


def test_mask_loss_combination():
    logits, labels = _rand_logits_labels(c=3)
    v = mask_loss(logits, labels)
    assert np.isfinite(float(v))


def test_dice_ignore_zero_shifts_classes_like_ce():
    # with ignore_label=0, classes 1..C map to channels 0..C-1 in BOTH
    # loss terms; a perfect (shifted) prediction must score ~0 dice loss
    labels = jnp.full((1, 8, 8), 2, jnp.int32)  # class 2 -> channel 1
    labels = labels.at[0, 0, 0].set(0)  # one ignored pixel
    logits = jnp.zeros((1, 8, 8, 2)).at[..., 1].set(50.0)
    assert float(dice_loss(logits, labels, ignore_label=0)) < 0.01


def test_unknown_reduction_raises():
    logits, labels = _rand_logits_labels(c=3)
    import pytest

    with pytest.raises(ValueError, match="unknown reduction"):
        cross_entropy_ignore_label(logits, labels, reduction="mean")


def test_contrastive_subsample_covers_whole_image():
    # ceil-stride: the subsample must reach the image bottom even when
    # H*W is just above max_samples (floor-stride selected only the top)
    rng = np.random.RandomState(1)
    feats = np.tile(rng.randn(1, 1, 1, 8).astype(np.float32), (1, 45, 45, 1))
    labels = np.zeros((1, 45, 45), np.int32)
    base = float(pixel_contrastive_loss(
        jnp.asarray(feats), jnp.asarray(labels), max_samples=1024))
    # perturb ONLY the bottom rows: the loss must react
    feats2 = feats.copy()
    feats2[:, 30:] = rng.randn(1, 15, 45, 8)
    labels2 = labels.copy()
    labels2[:, 30:] = 1
    moved = float(pixel_contrastive_loss(
        jnp.asarray(feats2), jnp.asarray(labels2), max_samples=1024))
    assert abs(moved - base) > 1e-6


def test_smooth_l1():
    assert float(smooth_l1_loss(jnp.array([0.5]), jnp.array([0.0]))) == 0.125
    assert float(smooth_l1_loss(jnp.array([2.0]), jnp.array([0.0]))) == 1.5


def test_pixel_contrastive_loss_finite():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 3, (2, 8, 8)), jnp.int32)
    v = pixel_contrastive_loss(feats, labels, max_samples=32)
    assert np.isfinite(float(v))
