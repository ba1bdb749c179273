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
