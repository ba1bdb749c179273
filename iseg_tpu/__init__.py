"""iseg_tpu — a TPU-native (JAX/XLA/Pallas/pjit) semantic-segmentation framework.

A from-scratch rebuild of the capability surface of edwardyehuang/iSeg
(a Keras 3 / TensorFlow 2 segmentation library), designed TPU-first:

* one jitted train step over a ``jax.sharding.Mesh`` (GSPMD data parallel;
  optional model axis for the Gemma LM module),
* global-batch BatchNorm under GSPMD == the reference's SyncBN
  (reference: ``layers/syncbn.py:20``, ``layers/keras3/bn.py:76``),
* Pallas kernels where they beat XLA's fusion (dense-local deformable
  sampling, window attention, fused upsample+cross-entropy — each probed
  against the XLA path and wired only where measured faster; see
  BENCH_NOTES.md),
* optax-based optimizer factory with poly/cosine warmup schedules,
  per-variable lr multipliers and weight-decay exclusion
  (reference: ``core_optimizer.py:18``, ``optimizers/``),
* ignore-label-aware losses/metrics with a streaming confusion-matrix mIoU
  (reference: ``losses/catecrossentropy_ignore_label.py:14``,
  ``metrics/mean_iou.py:86``).

The package-root exports mirror the reference's ``__init__.py:7-8`` which
re-exported the model bases and the numeric-check controls.
"""

from iseg_tpu.ops.numerics import check_numerics, set_check_numerics_level
from iseg_tpu.core.model import SegBase, SegFoundation, SegModelInferenceConfig

__version__ = "0.1.0"

__all__ = [
    "check_numerics",
    "set_check_numerics_level",
    "SegBase",
    "SegFoundation",
    "SegModelInferenceConfig",
]
