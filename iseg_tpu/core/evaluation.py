"""Evaluation driver: custom eval loop with streaming mIoU.

Parity with the reference's ``evaluations/evaluation.py:19`` ``evaluate``
(custom loop; multi-scale + flip + sliding-window inference, per-class IoU
report at the end) and ``evaluations/core_eval.py:22`` (single-scale
fast path).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp

from iseg_tpu.core.inference import inference_with_multi_scales
from iseg_tpu.core.model import SegModelInferenceConfig
from iseg_tpu.metrics.mean_iou import MeanIoU
from iseg_tpu.parallel.mesh import MeshEnv, shard_batch


def make_eval_step(
    apply_fn: Callable,
    variables,
    inference_config: Optional[SegModelInferenceConfig] = None,
) -> Callable:
    """One jitted eval step: images -> averaged logits.

    The full multi-scale/flip/sliding-window sweep compiles into a single
    XLA program per input shape (the reference re-enters ``strategy.run``
    per scale, ``evaluations/evaluation.py:99-124``).
    """
    cfg = inference_config or SegModelInferenceConfig()

    def single_with(vars_, x):
        out = apply_fn(vars_, x, train=False)
        if isinstance(out, dict):
            out = out["output_0"]
        if isinstance(out, (list, tuple)):
            out = out[0]
        return out

    if cfg.use_cpu_cache:
        # host-offload variant (reference ``core_model.py:274-320``
        # ``use_cpu_cache``): one jitted program per (scale, flip), logit
        # accumulation in host memory — for images whose multi-scale logit
        # stack exceeds HBM.
        from iseg_tpu.core.inference import inference_with_scale
        import numpy as np

        jitted = {}
        seen_shapes = set()

        def eval_step(images):
            seen_shapes.add(tuple(images.shape))
            acc = None
            count = 0
            for scale in cfg.scale_rates:
                for flipped in ((False, True) if cfg.flip else (False,)):
                    key = (scale, flipped, images.shape)
                    if key not in jitted:
                        jitted[key] = jax.jit(
                            lambda v, x, s=scale, f=flipped: inference_with_scale(
                                lambda y: single_with(v, y), x, s, flipped=f,
                                sliding_window_crop_size=cfg.sliding_window_crop_size,
                                sliding_window_stride_rate=cfg.sliding_window_stride_rate,
                                sliding_window_batch=cfg.sliding_window_batch,
                            )
                        )
                    logits = np.asarray(jitted[key](variables, images))
                    acc = logits if acc is None else acc + logits
                    count += 1
            return acc / count

        # one compiled program per (scale, flip, shape) on this path
        eval_step.seen_shapes = seen_shapes
        return eval_step

    # variables enter as a jit ARGUMENT (a closure would bake the weights
    # into the executable as constants — slow compiles for big models)
    @jax.jit
    def _eval_jit(vars_, images):
        return inference_with_multi_scales(
            lambda x: single_with(vars_, x),
            images,
            scale_rates=tuple(cfg.scale_rates),
            flip=cfg.flip,
            flip_in_batch=cfg.flip_in_batch,
            sliding_window_crop_size=cfg.sliding_window_crop_size,
            sliding_window_stride_rate=cfg.sliding_window_stride_rate,
            sliding_window_batch=cfg.sliding_window_batch,
        )

    seen_shapes = set()

    def eval_step(images):
        seen_shapes.add(tuple(images.shape))
        return _eval_jit(variables, images)

    # each distinct input shape = one compiled program (introspection for
    # bucket accounting / tests)
    eval_step.seen_shapes = seen_shapes
    return eval_step


def evaluate(
    env: MeshEnv,
    model,
    variables,
    dataset: Iterable[dict],
    num_class: Optional[int] = None,
    ignore_label: Optional[int] = None,
    inference_config: Optional[SegModelInferenceConfig] = None,
    verbose: bool = True,
    compute_loss: bool = False,
    log_dir: Optional[str] = None,
    log_step: int = 0,
):
    """Run eval over ``dataset`` yielding {"image", "label"} host batches;
    returns (mean_iou, per_class_iou) (reference ``evaluation.py:19-90``,
    which also streams a running loss — enable with ``compute_loss``).

    ``log_dir`` writes eval scalars (mIoU, per-class IoU, loss) to a
    TensorBoard event file + CSV at ``log_step`` (utils.summary), the
    durable analogue of the reference's TensorBoard callback."""
    num_class = num_class if num_class is not None else model.num_class
    ignore_label = ignore_label if ignore_label is not None else model.ignore_label

    eval_step = make_eval_step(model.apply, variables, inference_config)
    miou = MeanIoU(num_class, ignore_label)

    loss_fn = None
    if compute_loss:
        from iseg_tpu.losses.cross_entropy import cross_entropy_ignore_label

        loss_fn = jax.jit(
            lambda lg, lb: cross_entropy_ignore_label(
                lg, lb, ignore_label=ignore_label
            )
        )

    cfg = inference_config or SegModelInferenceConfig()

    n_batches = 0
    loss_sum = 0.0
    for batch in dataset:
        if cfg.bucket_multiple:
            # quantize variable sizes to the bucket grid so eval compiles
            # O(#buckets) programs (utils/buckets; SURVEY hard-part #1)
            import numpy as np

            from iseg_tpu.utils.buckets import pad_batch_to_bucket

            img, lab, _ = pad_batch_to_bucket(
                np.asarray(batch["image"]),
                np.asarray(batch["label"]),
                multiple=cfg.bucket_multiple,
                image_pad_value=cfg.bucket_pad_value,
                ignore_label=ignore_label,
            )
            batch = {**batch, "image": img, "label": lab}
        batch = shard_batch(env.mesh, batch)
        logits = eval_step(batch["image"])
        miou.update_state(batch["label"], logits)
        if loss_fn is not None:
            loss_sum += float(loss_fn(logits, batch["label"]))
        n_batches += 1
        if verbose and n_batches % 50 == 0:
            msg = f"eval batch {n_batches}: running mIoU={miou.result():.4f}"
            if loss_fn is not None:
                msg += f" loss={loss_sum / n_batches:.4f}"
            print(msg, flush=True)

    # diagnostic: how many distinct programs this eval compiled (bucket
    # accounting; one per distinct padded shape)
    evaluate.last_num_programs = len(getattr(eval_step, "seen_shapes", ()))

    per_class = miou.per_class_iou()
    if log_dir is not None:
        from iseg_tpu.utils.summary import ScalarLogger

        logger = ScalarLogger(log_dir)
        scalars = {"eval/mean_iou": float(miou.result())}
        if loss_fn is not None and n_batches:
            scalars["eval/loss"] = loss_sum / n_batches
        for i, v in enumerate(per_class):
            scalars[f"eval/iou_class_{i}"] = float(v)
        logger.log(scalars, log_step)
        logger.close()
    if verbose:
        print(f"eval done ({n_batches} batches): mIoU={miou.result():.4f}"
              + (f" loss={loss_sum / max(n_batches, 1):.4f}" if loss_fn else ""))
        for i, v in enumerate(per_class):
            print(f"  class {i}: IoU={v:.4f}")
    return miou.result(), per_class
