"""Abstract model tier: SegBase / SegFoundation / SegManaged.

Parity with the reference's ``core_model.py`` (``SegBase`` :51,
``SegFoundation`` :329, ``SegModelInferenceConfig`` :24) and
``layers/core_model_ext.py:24`` (``SegManaged`` — the assembled
backbone + head + logits-conv model).

TPU-first: models are pure flax modules; the "predict_step/test_step"
overrides of the Keras design become free inference-engine functions in
``iseg_tpu.core.inference`` that close over ``model.apply``. Loss/metric
assembly (``custom_losses`` ``core_model.py:471-529``) is a pure function of
the model's config, producing one jit-able loss callable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from iseg_tpu.losses.cross_entropy import cross_entropy_ignore_label
from iseg_tpu.losses.ohem import get_ohem_fn
from iseg_tpu.ops.resize import resize_image


@dataclasses.dataclass
class SegModelInferenceConfig:
    """Inference knobs (reference ``core_model.py:24``)."""

    scale_rates: Sequence[float] = (1.0,)
    flip: bool = False
    sliding_window_crop_size: Optional[tuple[int, int]] = None
    sliding_window_stride_rate: float = 2.0 / 3.0
    # Windows folded into the batch dim per model call during the sweep
    # (1 = reference behavior, one window per step). Higher values feed
    # the MXU at batch-1 eval; results are identical.
    sliding_window_batch: int = 1
    # Fold each scale's (identity, flip) pair into one forward at double
    # batch — half the model calls, identical results. Ignored by the
    # use_cpu_cache path (which exists to MINIMIZE per-pass memory).
    flip_in_batch: bool = False
    use_cpu_cache: bool = False  # host-offload of the logit accumulator
    # Shape bucketing (SURVEY hard-part #1): quantize variable eval sizes
    # to a grid so Cityscapes-style eval compiles O(#buckets) programs,
    # not O(#shapes). None disables. Labels pad with ignore_label; images
    # pad with ``bucket_pad_value`` (0 = the mean pixel after zero-mean
    # input normalization).
    bucket_multiple: Optional[int] = None
    bucket_pad_value: float = 0.0


class SegBase(nn.Module):
    """Marker base for segmentation models (reference ``core_model.py:51``).

    Subclasses implement ``__call__(x, train=False)`` returning logits
    [N, H, W, num_class] or a list of them (main output first)."""

    def inference(self, variables, x, **kwargs):
        """Single-scale inference (reference ``core_model.py:118``)."""
        out = self.apply(variables, x, train=False, **kwargs)
        if isinstance(out, (list, tuple)):
            out = out[0]
        if isinstance(out, dict):
            out = out["output_0"]
        return out


class SegFoundation(SegBase):
    """Adds aux-loss/metric plumbing (reference ``core_model.py:329``):
    aux outputs, loss rates, OHEM/focal switches, class weights."""

    num_class: int = 21
    num_aux_loss: int = 0
    aux_loss_rate: float = 0.4
    use_ohem: bool = False
    ohem_thresh: float = 0.7
    ohem_min_kept: int = 100000
    ohem_ref_exact: bool = False  # the reference's exact WIP selector
    use_focal_loss: bool = False
    focal_loss_gamma: float = 2.0
    focal_loss_alpha: Optional[float] = 0.25
    class_weights: Optional[Sequence[float]] = None
    ignore_label: int = 255
    # loss reduction: "valid_mean" (default) or "global_batch" — the
    # reference's ``reduction=True`` / tf.nn.compute_average_loss path
    # (catecrossentropy_ignore_label.py:85-86). "global_batch" needs
    # ``loss_global_batch_size`` (total images per step, all replicas).
    loss_reduction: str = "valid_mean"
    loss_global_batch_size: Optional[int] = None
    # fuse the logits upsample into the loss (Pallas kernel): pair with
    # upsample_logits=False so full-res logits never materialize. Plain CE
    # only (no OHEM/focal/class-weights on the fused path).
    fuse_upsample_loss: bool = False

    def custom_losses_weights(self) -> list[float]:
        """Main + aux loss weights (reference ``core_model.py:531``)."""
        return [1.0] + [self.aux_loss_rate] * self.num_aux_loss

    def custom_metrics(self):
        """Default metric set keyed ``output_N`` (reference
        ``core_model.py:543`` via ``SegMetricBuilder``)."""
        from iseg_tpu.metrics.builder import SegMetricBuilder

        builder = SegMetricBuilder(self.num_class, self.ignore_label)
        for _ in range(1 + self.num_aux_loss):
            builder.add()
        return builder

    def build_loss_fn(self) -> Callable:
        """One jit-able callable ``loss_fn(outputs, labels) -> (total, dict)``
        (reference ``custom_losses`` ``core_model.py:471-529``: dict keyed
        ``output_N``, OHEM applied to the main output only)."""
        weights = self.custom_losses_weights()
        ohem_fn = (
            get_ohem_fn(self.ohem_thresh, self.ohem_min_kept,
                        ref_exact=self.ohem_ref_exact)
            if self.use_ohem else None
        )
        use_fused = (
            self.fuse_upsample_loss
            and not self.use_ohem
            and not self.use_focal_loss
            and self.class_weights is None
            # the fused kernel computes a valid-pixel mean only — it must
            # not silently override a configured all_mean/global_batch
            # gradient scale
            and self.loss_reduction == "valid_mean"
        )

        def loss_fn(outputs, labels):
            outs = normalize_outputs(outputs)
            total = 0.0
            parts = {}
            for i, (key, logits) in enumerate(outs.items()):
                if use_fused and logits.shape[1] < labels.shape[1]:
                    from iseg_tpu.ops.pallas.upsample_ce import (
                        upsample_cross_entropy,
                    )

                    loss = upsample_cross_entropy(
                        logits, labels, ignore_label=self.ignore_label
                    )
                else:
                    if (self.fuse_upsample_loss
                            and logits.shape[1] < labels.shape[1]):
                        # fusion requested but gated out (OHEM/focal/class
                        # weights/non-default reduction): the model emits
                        # LOW-RES logits, so reproduce the upsample here —
                        # otherwise the loss would silently run at logits
                        # resolution
                        from iseg_tpu.ops.resize import resize_image

                        logits = resize_image(
                            logits.astype(jnp.float32),
                            (labels.shape[1], labels.shape[2]), "bilinear")
                    loss = cross_entropy_ignore_label(
                        logits,
                        labels,
                        num_classes=self.num_class,
                        ignore_label=self.ignore_label,
                        class_weights=self.class_weights,
                        use_focal=self.use_focal_loss,
                        focal_gamma=self.focal_loss_gamma,
                        focal_alpha=self.focal_loss_alpha,
                        ohem_fn=ohem_fn if i == 0 else None,
                        reduction=self.loss_reduction,
                        global_batch_size=self.loss_global_batch_size,
                    )
                parts[f"{key}_loss"] = loss
                rate = weights[i] if i < len(weights) else 1.0
                total = total + rate * loss
            parts["loss"] = total
            return total, parts

        return loss_fn


def normalize_outputs(outputs) -> dict[str, jax.Array]:
    """list/tuple/dict/array -> {"output_0": ..., "output_1": ...}
    (reference ``core_inference.py:60-133`` multi-output normalization)."""
    if isinstance(outputs, dict):
        return outputs
    if isinstance(outputs, (list, tuple)):
        return {f"output_{i}": o for i, o in enumerate(outputs)}
    return {"output_0": outputs}


class SegManaged(SegFoundation):
    """The assembled model (reference ``layers/core_model_ext.py:24``):
    backbone -> head -> per-output 1x1 logits conv -> bilinear upsample to
    input size -> fp32 cast. Aux outputs get their own logits convs
    (``core_model_ext.py:142``).
    """

    backbone: Optional[nn.Module] = None
    head: Optional[nn.Module] = None
    use_aux_head_endpoints: bool = False  # feed backbone endpoints to aux convs
    upsample_logits: bool = True
    # input routing (reference core_model_ext.py:266-334): heads may also
    # receive the label map and/or the raw image alongside the endpoints
    head_use_label_input: bool = False
    head_use_image_input: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # dict/tuple input routing: {"image": ..., "label": ...} or
        # (image, label) — label-as-input models consume it in the head
        label = None
        if isinstance(x, dict):
            label = x.get("label")
            x = x["image"]
        elif isinstance(x, (tuple, list)):
            x, label = x[0], (x[1] if len(x) > 1 else None)

        inputs_hw = (x.shape[1], x.shape[2])
        image = x
        if self.dtype is not None:
            x = x.astype(self.dtype)

        feats = self.backbone(x, train=train) if self.backbone is not None else x
        endpoints = feats if isinstance(feats, (list, tuple)) else [feats]

        if self.head is not None:
            head_kwargs = {}
            if self.head_use_label_input:
                head_kwargs["label"] = label
            if self.head_use_image_input:
                head_kwargs["image"] = image
            head_out = self.head(endpoints, train=train, **head_kwargs)
        else:
            head_out = endpoints[-1]
        head_outs = list(head_out) if isinstance(head_out, (list, tuple)) else [head_out]

        # aux branches beyond what the head returned come from backbone
        # endpoints (reference core_model_ext.py:304-318)
        while self.use_aux_head_endpoints and len(head_outs) < 1 + self.num_aux_loss:
            idx = -(len(head_outs) + 1)
            head_outs.append(endpoints[idx])

        logits_list = []
        for i, h in enumerate(head_outs[: 1 + self.num_aux_loss]):
            logits = nn.Conv(
                self.num_class,
                (1, 1),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"logits_conv_{i}" if i else "logits_conv",
            )(h)
            if self.upsample_logits and logits.shape[1:3] != inputs_hw:
                logits = resize_image(logits, inputs_hw, "bilinear")
            # fp32 output cast (reference core_model_ext.py:229-256)
            logits_list.append(logits.astype(jnp.float32))

        if len(logits_list) == 1:
            return logits_list[0]
        return {f"output_{i}": l for i, l in enumerate(logits_list)}
