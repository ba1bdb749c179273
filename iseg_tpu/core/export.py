"""Serving export: serialize a ready-to-run inference artifact.

The reference deploys by shipping Python + weights and rebuilding the
Keras graph at load time. TPU-native serving wants an ahead-of-time
artifact instead: ``export_inference`` lowers the model's inference
function (weights baked in as constants) to a serialized StableHLO
module via ``jax.export`` — loadable and runnable with NO model code, on
any JAX runtime with a compatible backend, batch-polymorphic by default.

    blob = export_inference(model, variables, input_hw=(512, 512))
    ...
    serve_fn = load_exported(blob)          # or a file path
    logits = serve_fn(images)               # any batch size

Covers: logits / softmax-probs / argmax-label outputs, optional
multi-scale+flip averaging (fixed input size), and arbitrary batch via a
symbolic batch dimension.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_inference(
    model,
    variables,
    input_hw: Sequence[int],
    *,
    channels: int = 3,
    output: str = "logits",
    batch_polymorphic: bool = True,
    scale_rates: Optional[Sequence[float]] = None,
    flip: bool = False,
    sliding_window_crop_size: Optional[Sequence[int]] = None,
    sliding_window_stride_rate: float = 2.0 / 3.0,
    int8_weights: bool = False,
    input_dtype=jnp.float32,
    path: Optional[str] = None,
) -> bytes:
    """Serialize the model's inference function with weights baked in.

    Args:
      model: a SegManaged (or any module whose ``apply(variables, x,
        train=False)`` returns logits or a list whose first entry is the
        main logits).
      variables: trained variables (params + batch_stats).
      input_hw: static spatial size the artifact serves.
      output: "logits", "probs", or "label" (argmax int32).
      batch_polymorphic: serve any batch size (symbolic leading dim).
      scale_rates / flip: bake multi-scale + flip logit averaging into the
        artifact (reference ``core_model.py:232-326`` semantics via
        ``iseg_tpu.core.inference.inference_with_multi_scales``).
      int8_weights: store weights as int8 + per-channel scales inside the
        artifact (``iseg_tpu.ops.quant``, ~2x smaller file); dequant
        happens inside the compiled function, fused into each consumer.
      path: optionally also write the serialized bytes to this file.

    Returns the serialized artifact bytes.
    """
    h, w = int(input_hw[0]), int(input_hw[1])

    if int8_weights:
        from iseg_tpu.ops.quant import dequantize_tree, quantize_tree

        qparams = quantize_tree(variables["params"])
        rest = {k: v for k, v in variables.items() if k != "params"}

        def make_variables():
            return {"params": dequantize_tree(qparams), **rest}
    else:
        def make_variables():
            return variables

    sliding_kwargs = {}
    if sliding_window_crop_size is not None:
        sliding_kwargs = {
            "sliding_window_crop_size": tuple(sliding_window_crop_size),
            "sliding_window_stride_rate": sliding_window_stride_rate,
        }

    def forward(x):
        v = make_variables()  # int8 leaves dequant inside the artifact
        apply_fn = lambda img: _main_output(  # noqa: E731
            model.apply(v, img, train=False))
        if scale_rates or flip:
            from iseg_tpu.core.inference import inference_with_multi_scales

            logits = inference_with_multi_scales(
                apply_fn, x, scale_rates=tuple(scale_rates or (1.0,)),
                flip=flip, **sliding_kwargs,
            )
        elif sliding_kwargs:
            from iseg_tpu.core.inference import inference_fn

            logits = inference_fn(apply_fn, x, **sliding_kwargs)
        else:
            logits = apply_fn(x)
        if output == "probs":
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if output == "label":
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return logits.astype(jnp.float32)

    if batch_polymorphic:
        (b,) = jax_export.symbolic_shape("b")
        in_shape = jax.ShapeDtypeStruct((b, h, w, channels), input_dtype)
    else:
        in_shape = jax.ShapeDtypeStruct((1, h, w, channels), input_dtype)

    exported = jax_export.export(jax.jit(forward))(in_shape)
    blob = bytes(exported.serialize())
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(blob_or_path: Union[bytes, str, os.PathLike]):
    """Load a serialized artifact; returns ``fn(images) -> output``.

    Needs no model code or weights — everything is in the artifact."""
    if isinstance(blob_or_path, (str, os.PathLike)):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = bytes(blob_or_path)
    exported = jax_export.deserialize(blob)

    def serve_fn(images):
        return exported.call(jnp.asarray(images))

    serve_fn.exported = exported
    return serve_fn


def _main_output(outputs):
    if isinstance(outputs, (list, tuple)):
        return outputs[0]
    if isinstance(outputs, dict):
        return outputs.get("output_0", next(iter(outputs.values())))
    return outputs
