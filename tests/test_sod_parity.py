"""SOD metric parity against the reference's own TF implementations.

Drives the reference's ``metrics/sod/sod_metrics.py`` classes (argument
order ``update_state(pred, gt)``, reference convention) on the same
inputs as our suite. Only MAE is asserted: probing the full family on
valid inputs showed the reference's TF helper tier off its own cited
algorithms — TFSmeasureMetric returns NaN, TFWeightedFmeasureMetric
crashes in tensor_scatter_nd_update, and TFEmeasure/TFFmeasure disagree
with the published adaptive-threshold definitions our suite follows
(which the hand-computed tests in test_sod.py / test_sod_fmeasurev2.py
pin instead).
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.parity

sys.path.insert(0, "tools")


@pytest.fixture(scope="module")
def ref():
    import ref_compat

    ref_compat.install_keras2_shims()
    from iseg.metrics.sod import sod_metrics as ref_sod

    return ref_sod


def test_mae_matches_reference_exactly(ref):
    import tensorflow as tf

    from iseg_tpu.metrics.sod.sod_metrics import MAEMetric

    rng = np.random.RandomState(0)
    gt = np.zeros((64, 64), np.float32)
    gt[16:48, 20:44] = 1
    pred = np.clip(gt * 0.8 + rng.rand(64, 64) * 0.2, 0, 1).astype(np.float32)

    tfm = ref.TFMAEMetric()
    tfm.update_state(tf.constant(pred[None, ..., None]),
                     tf.constant(gt[None, ..., None]))
    ours = MAEMetric()
    ours.update_state(gt, pred)
    assert abs(float(tfm.result()) - float(ours.result())) < 1e-6


def test_reference_smeasure_nan_documented(ref):
    """Pin the divergence this module's docstring claims: the reference's
    S-measure NaNs on a valid blob input while ours returns a sane score.
    If a reference fix ever lands, this test flags the docs for update."""
    import tensorflow as tf

    from iseg_tpu.metrics.sod.sod_metrics import SMeasureMetric

    rng = np.random.RandomState(0)
    gt = np.zeros((64, 64), np.float32)
    gt[16:48, 20:44] = 1
    pred = np.clip(gt * 0.8 + rng.rand(64, 64) * 0.2, 0, 1).astype(np.float32)

    tfm = ref.TFSmeasureMetric()
    tfm.update_state(tf.constant(pred[None, ..., None]),
                     tf.constant(gt[None, ..., None]))
    assert np.isnan(float(tfm.result()))  # the reference's own behavior

    ours = SMeasureMetric()
    ours.update_state(gt, pred)
    assert 0.8 < float(ours.result()) <= 1.0
