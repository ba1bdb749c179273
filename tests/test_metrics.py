import jax.numpy as jnp
import numpy as np

from iseg_tpu.metrics import (
    MeanIoU,
    SegMetricBuilder,
    confusion_matrix,
    iou_from_confusion,
    process_seg_metric_inputs,
)


def test_confusion_matrix_basic():
    labels = jnp.array([0, 0, 1, 1, 2])
    preds = jnp.array([0, 1, 1, 1, 0])
    cm = np.asarray(confusion_matrix(labels, preds, 3))
    expected = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 0]], np.float32)
    np.testing.assert_allclose(cm, expected)


def test_confusion_matrix_weights():
    labels = jnp.array([0, 1])
    preds = jnp.array([0, 1])
    w = jnp.array([1.0, 0.0])
    cm = np.asarray(confusion_matrix(labels, preds, 2, weights=w))
    np.testing.assert_allclose(cm, [[1, 0], [0, 0]])


def test_iou_from_confusion_excludes_absent_classes():
    cm = np.array([[5, 0, 0], [0, 5, 0], [0, 0, 0]], np.float64)
    iou, mean = iou_from_confusion(cm)
    np.testing.assert_allclose(iou[:2], [1.0, 1.0])
    assert mean == 1.0  # class 2 never appears -> excluded


def test_mean_iou_streaming_with_ignore():
    m = MeanIoU(num_classes=3, ignore_label=255)
    labels = jnp.array([[[0, 1], [2, 255]]], jnp.int32)
    preds = jnp.array([[[0, 1], [1, 0]]], jnp.int32)
    m.update_state(labels, preds)
    m.update_state(labels, preds)
    # class0: tp=2(x2)... compute: per update tp0=1,fp0 from ignored? ignored has w=0
    # cm per update: l0p0=1, l1p1=1, l2p1=1
    iou = m.per_class_iou()
    np.testing.assert_allclose(iou, [1.0, 0.5, 0.0])
    assert abs(m.result() - 0.5) < 1e-6


def test_mean_iou_accepts_logits():
    m = MeanIoU(num_classes=2, ignore_label=255)
    labels = jnp.zeros((1, 4, 4), jnp.int32)
    logits = jnp.zeros((1, 4, 4, 2)).at[..., 0].set(5.0)
    m.update_state(labels, logits)
    assert m.result() == 1.0


def test_metric_wrapper_resizes_labels():
    labels = jnp.zeros((1, 8, 8), jnp.int32)
    logits = jnp.zeros((1, 4, 4, 2)).at[..., 1].set(3.0)
    lab, pred, w = process_seg_metric_inputs(labels, logits)
    assert lab.shape == (1, 4, 4)
    assert pred.shape == (1, 4, 4)
    assert np.asarray(pred).max() == 1


def test_ignore_label_zero_shifts_classes_like_the_loss():
    # classes stored 1..C with ignore_label=0 (the convention the CE loss
    # shifts, losses/cross_entropy.py): a PERFECT prediction must score
    # mIoU 1.0 — without the shift every class lands on the wrong channel
    m = MeanIoU(num_classes=2, ignore_label=0)
    labels = jnp.asarray([[[1, 2], [2, 0]]], jnp.int32)  # 0 = ignore
    logits = jnp.zeros((1, 2, 2, 2))
    logits = logits.at[0, 0, 0, 0].set(5.0)  # class 1 -> channel 0
    logits = logits.at[0, 0, 1, 1].set(5.0)  # class 2 -> channel 1
    logits = logits.at[0, 1, 0, 1].set(5.0)
    logits = logits.at[0, 1, 1, 0].set(5.0)  # ignored, value irrelevant
    m.update_state(labels, logits)
    assert m.result() == 1.0


def test_seg_metric_wrapper_preprocesses_before_inner():
    # the wrapper's contract: ignore masking + argmax run BEFORE the
    # inner metric (reference seg_metric_wrapper.py:95-102)
    from iseg_tpu.metrics import SegMetricWrapper

    seen = {}

    class Inner:
        def update_state(self, labels, preds, weights):
            seen["labels"] = np.asarray(labels)
            seen["preds"] = np.asarray(preds)
            seen["weights"] = np.asarray(weights)

    wrapper = SegMetricWrapper(Inner(), ignore_label=255)
    labels = jnp.asarray([[[0, 255], [1, 1]]], jnp.int32)
    logits = jnp.zeros((1, 2, 2, 2)).at[..., 1].set(3.0)
    wrapper.update_state(labels, logits)
    assert seen["preds"].shape == (1, 2, 2)  # argmax'd
    assert seen["weights"][0, 0, 1] == 0.0  # ignore pixel masked
    assert seen["labels"][0, 0, 1] == 0  # ignore pixel zeroed


def test_seg_metric_builder():
    b = SegMetricBuilder(num_classes=2, ignore_label=255)
    b.add()
    b.add()
    labels = jnp.zeros((1, 4, 4), jnp.int32)
    outputs = {
        "output_0": jnp.zeros((1, 4, 4, 2)).at[..., 0].set(5.0),
        "output_1": jnp.zeros((1, 4, 4, 2)).at[..., 1].set(5.0),
    }
    b.update_state(labels, outputs)
    res = b.results()
    assert res["output_0_miou"] == 1.0
    assert res["output_1_miou"] == 0.0
    b.reset_state()
    assert b._metrics["output_0"][0].total_cm.sum() == 0
