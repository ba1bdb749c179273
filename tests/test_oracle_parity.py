"""Oracle parity for metric preprocessing and photometric ops: drive the
reference's own code / the TF op the reference wraps on identical inputs.
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.parity

sys.path.insert(0, "tools")


@pytest.fixture(scope="module")
def shims():
    import ref_compat

    ref_compat.install_keras2_shims()


def test_confusion_matrix_matches_reference_wrapper(shims):
    """Our MeanIoU's preprocessing + CM must equal the reference's
    process_seg_metric_inputs -> tf.math.confusion_matrix for BOTH ignore
    conventions, including the ignore_label==0 class shift
    (seg_metric_wrapper.py:60-61)."""
    import tensorflow as tf
    from iseg.metrics.seg_metric_wrapper import (
        process_seg_metric_inputs as ref_pi,
    )

    from iseg_tpu.metrics.mean_iou import MeanIoU

    rng = np.random.RandomState(0)
    for ignore in (255, 0):
        nc = 5
        lo = 1 if ignore == 0 else 0
        labels = rng.randint(lo, nc + lo, (2, 16, 16)).astype(np.int32)
        labels[0, :3] = ignore
        logits = rng.randn(2, 16, 16, nc).astype(np.float32)
        y_t, y_p, w = ref_pi(tf.constant(labels), tf.constant(logits),
                             num_class=nc, ignore_label=ignore)
        ref_cm = tf.math.confusion_matrix(
            tf.reshape(y_t, [-1]), tf.reshape(y_p, [-1]), num_classes=nc,
            weights=tf.reshape(w, [-1])).numpy()
        m = MeanIoU(nc, ignore_label=ignore)
        m.update_state(labels, logits)
        np.testing.assert_array_equal(ref_cm, m.total_cm,
                                      err_msg=f"ignore={ignore}")


def test_hue_matches_tf_adjust_hue(shims):
    """RandomHueAugment must be the exact HSV shift of tf.image.adjust_hue
    (the op the reference wraps, random_hue_augment.py:22)."""
    import tensorflow as tf

    from iseg_tpu.data.augments import RandomHueAugment

    class FixedRng:
        def __init__(self, d):
            self.d = d

        def uniform(self, lo, hi):
            return self.d

    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3).astype(np.float32) * 160 + 40
    for delta in (0.02, 0.1, 0.37, -0.2):
        want = tf.image.adjust_hue(img / 255.0, delta).numpy() * 255.0
        got, _ = RandomHueAugment(max_delta=abs(delta) + 1e-9, prob=1.0).call(
            FixedRng(delta), img.copy(), None)
        np.testing.assert_allclose(got, np.clip(want, 0, 255), atol=2e-3,
                                   err_msg=f"delta={delta}")


def test_sliding_start_indices_match_reference(shims):
    """Window-start math vs the reference's own python implementation
    (utils/sliding_window_inference_utils.py). For images smaller than
    the crop the reference emits a NEGATIVE start (its caller pads
    first); we clamp the window to the image instead — pinned here."""
    from iseg.utils.sliding_window_inference_utils import (
        _get_sliding_start_indexs_py,
    )

    from iseg_tpu.core.inference import sliding_start_indices

    for length, crop in ((1024, 512), (2048, 512), (700, 512), (512, 512),
                         (1537, 512), (513, 512)):
        ref = list(_get_sliding_start_indexs_py(length, crop, 2.0 / 3.0))
        ours = sliding_start_indices(length, crop, int(crop * 2.0 / 3.0))
        assert ref == list(ours), (length, crop, ref, ours)
    # the documented divergence: sub-crop images clamp, not go negative
    assert list(_get_sliding_start_indexs_py(300, 512, 2 / 3))[0] < 0
    assert sliding_start_indices(300, min(512, 300), 200) == [0]


def test_ce_ignore_label_loss_matches_reference(shims):
    """cross_entropy_ignore_label vs the reference loss on identical data,
    both reductions, both ignore conventions (incl. the ignore-0 shift)."""
    import jax.numpy as jnp
    import tensorflow as tf
    from iseg.losses.catecrossentropy_ignore_label import (
        catecrossentropy_ignore_label_loss,
    )

    from iseg_tpu.losses.cross_entropy import cross_entropy_ignore_label

    rng = np.random.RandomState(0)
    for ignore in (255, 0):
        nc = 5
        lo = 1 if ignore == 0 else 0
        labels = rng.randint(lo, nc + lo, (2, 8, 8)).astype(np.int32)
        labels[0, :2] = ignore
        logits = rng.randn(2, 8, 8, nc).astype(np.float32)

        ref_gb = catecrossentropy_ignore_label_loss(
            num_class=nc, ignore_label=ignore, batch_size=2, reduction=True)
        want = float(ref_gb(tf.constant(labels[..., None]),
                            tf.constant(logits)))
        got = float(cross_entropy_ignore_label(
            jnp.asarray(logits), jnp.asarray(labels), ignore_label=ignore,
            reduction="global_batch", global_batch_size=2))
        assert abs(want - got) < 1e-4 * max(1.0, abs(want)), (ignore, want, got)

        ref_none = catecrossentropy_ignore_label_loss(
            num_class=nc, ignore_label=ignore, batch_size=2, reduction=False)
        want_mean = float(np.asarray(ref_none(
            tf.constant(labels[..., None]), tf.constant(logits))).mean())
        got_mean = float(cross_entropy_ignore_label(
            jnp.asarray(logits), jnp.asarray(labels), ignore_label=ignore,
            reduction="all_mean"))
        assert abs(want_mean - got_mean) < 1e-5, (ignore, want_mean, got_mean)


def test_poly_decay_ref_exact_matches_reference(shims):
    from iseg.optimizers.polydecay import WarmUpPolyDecay

    from iseg_tpu.core.optimizer import warmup_poly_decay

    ref = WarmUpPolyDecay(0.01, 1000, end_learning_rate=1e-4,
                          warmup_steps=100, warmup_learning_rate=1e-5,
                          power=0.9)
    ours = warmup_poly_decay(0.01, 1000, end_learning_rate=1e-4, power=0.9,
                             warmup_steps=100, warmup_learning_rate=1e-5,
                             ref_exact=True)
    for step in (0, 1, 50, 99, 100, 101, 500, 899, 900, 999, 1000, 1100):
        assert abs(float(ref(step)) - float(ours(step))) < 1e-7, step
    # and the documented default DIVERGENCE: standard semantics anneal to
    # the end LR at decay_steps, the reference quirk does not
    std = warmup_poly_decay(0.01, 1000, end_learning_rate=1e-4, power=0.9,
                            warmup_steps=100, warmup_learning_rate=1e-5)
    assert abs(float(std(1000)) - 1e-4) < 1e-7
    assert float(ref(1000)) > 1e-3


def test_resize_to_range_matches_reference_shapes(shims):
    """Our size math must equal the shapes the reference's tensor op
    actually produces (data_process/utils.py:374), including downscaling
    to the min side and the max_size cap."""
    import tensorflow as tf
    from iseg.data_process.utils import resize_to_range as ref_rtr

    from iseg_tpu.ops.resize import resize_to_range as our_rtr

    for (h, w), kw in [((600, 800), dict(min_size=512)),
                       ((300, 200), dict(min_size=512)),
                       ((600, 800), dict(min_size=512, max_size=640)),
                       ((2048, 1024), dict(min_size=512, max_size=1333)),
                       ((512, 512), dict(min_size=512, max_size=512))]:
        out = ref_rtr(tf.zeros((h, w, 3)), **kw)
        ref_shape = tuple(np.asarray(out[0]).shape[:2])
        assert ref_shape == our_rtr(h, w, **kw), ((h, w), kw, ref_shape)


def test_cosine_decay_matches_reference(shims):
    from iseg.optimizers.cosinedecay import CosineDecay as RefCosine

    from iseg_tpu.core.optimizer import warmup_cosine_decay

    ref = RefCosine(0.01, 1000)
    ours = warmup_cosine_decay(0.01, 1000)
    for s in (0, 1, 100, 500, 999, 1000):
        assert abs(float(ref(s)) - float(ours(s))) < 1e-9, s


def test_dcnv2_matches_reference_with_synced_weights(shims):
    """Weight-synced forward parity with the reference's DCNv2
    (layers/dcn_v2.py, the keras_DCNv2-derived sampler): same kernel /
    bias / offset weights must give the same output, including samples
    pushed past the border (the reference clamps into its zero-pad ring,
    we zero outside — equivalent)."""
    import jax
    import jax.numpy as jnp
    import tensorflow as tf
    from iseg.layers.dcn_v2 import DCNv2 as RefDCNv2

    from iseg_tpu.nn.dcn import DCNv2 as OurDCNv2

    rng = np.random.RandomState(0)
    x = rng.rand(2, 8, 8, 4).astype(np.float32)

    for off_scale in (0.3, 3.0):  # in-range and far out-of-bounds samples
        ref = RefDCNv2(filters=6, kernel_size=(3, 3), use_bias=True)
        _ = ref(tf.constant(x))
        kernel = rng.randn(3, 3, 4, 6).astype(np.float32) * 0.2
        bias = rng.randn(6).astype(np.float32) * 0.1
        off_k = rng.randn(3, 3, 4, 27).astype(np.float32) * 0.2
        off_b = rng.randn(27).astype(np.float32) * off_scale
        ref.kernel.assign(kernel)
        ref.bias.assign(bias)
        ref.offset_kernel.assign(off_k)
        ref.offset_bias.assign(off_b)
        want = np.asarray(ref(tf.constant(x)))

        ours = OurDCNv2(filters=6, kernel_size=3, use_bias=True)
        v = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = dict(v["params"])
        params["offset_conv"] = {"kernel": jnp.asarray(off_k),
                                 "bias": jnp.asarray(off_b)}
        params["kernel"] = jnp.asarray(kernel.reshape(9 * 4, 6))
        params["bias"] = jnp.asarray(bias)
        got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"off_scale={off_scale}")
