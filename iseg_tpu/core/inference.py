"""Inference engine: single-scale, multi-scale + flip, sliding-window.

Parity with the reference's ``core_inference.py`` (dispatch ``inference_fn``
:46, sliding window :230 with start-index grid + overlap count map
:143-207) and ``core_model.py:232`` (multi-scale + flip logit averaging).

TPU-first design:
* the window-start grid and the overlap count map are **host-precomputed
  numpy constants** (they depend only on static shapes) — the reference
  rebuilds them per call in a ``tf.while_loop`` (:143-207);
* all windows share one shape, so the whole sweep is a single
  ``lax.scan`` over start indices with ``dynamic_slice`` /
  ``dynamic_update_slice`` accumulation — one trace, no retraces, no
  host round-trips (the reference's ``use_cpu_cache`` identity hops
  :282-297 exist only to dodge TF memory limits);
* multi-scale builds one fused XLA program (python loop over static
  scales inside jit).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.ops.resize import resize_image, scaled_size


def sliding_start_indices(length: int, window: int, stride: int) -> list[int]:
    """Window start offsets covering [0, length) with a final snapped-to-end
    window (reference ``utils/sliding_window_inference_utils.py:5-64``)."""
    if window >= length:
        return [0]
    stride = max(1, stride)
    starts = list(range(0, length - window + 1, stride))
    if starts[-1] != length - window:
        starts.append(length - window)
    return starts


def sliding_window_plan(
    image_hw: tuple[int, int],
    crop_size: tuple[int, int],
    stride_rate: float = 2.0 / 3.0,
) -> tuple[np.ndarray, np.ndarray, tuple[int, int]]:
    """(starts [K,2], count_map [H,W,1], window_hw) — all static."""
    if stride_rate > 1.0:
        # windows would leave gaps with count 0 -> 0/0 NaN logits
        raise ValueError(
            f"sliding_window stride_rate {stride_rate} > 1.0 leaves "
            "uncovered pixels between windows")
    h, w = image_hw
    wh, ww = min(crop_size[0], h), min(crop_size[1], w)
    hs = sliding_start_indices(h, wh, int(wh * stride_rate))
    ws = sliding_start_indices(w, ww, int(ww * stride_rate))
    starts = np.array([(i, j) for i in hs for j in ws], np.int32)
    counts = np.zeros((h, w, 1), np.float32)
    for i, j in starts:
        counts[i : i + wh, j : j + ww] += 1.0
    return starts, counts, (wh, ww)


def inference_with_sliding_window(
    apply_fn: Callable[[jax.Array], jax.Array],
    images: jax.Array,
    crop_size: tuple[int, int],
    stride_rate: float = 2.0 / 3.0,
    window_batch: int = 1,
) -> jax.Array:
    """Sliding-window logits (reference ``core_inference.py:230``).

    ``apply_fn(window) -> logits`` must return logits at window resolution.

    ``window_batch > 1`` folds that many windows into the batch dimension
    per model call (one ``lax.scan`` step runs ``window_batch * n`` images
    through one forward). Typical sliding-window eval runs batch 1, where
    a single 512^2 window under-feeds the MXU; batching windows recovers
    training-like utilization at identical results (eval-mode forwards are
    per-sample; the window list pads with zero-weight sentinel windows).
    The reference sweeps strictly one window per step
    (``core_inference.py:288-293``).
    """
    n, h, w, c = images.shape
    starts, counts, (wh, ww) = sliding_window_plan((h, w), crop_size, stride_rate)

    if len(starts) == 1 and (wh, ww) == (h, w):
        return apply_fn(images)

    out_shape = jax.eval_shape(apply_fn, jax.ShapeDtypeStruct((n, wh, ww, c), images.dtype))
    k = out_shape.shape[-1]
    canvas = jnp.zeros((n, h, w, k), jnp.float32)

    wb = max(1, min(int(window_batch), len(starts)))
    starts_w = _chunk_weighted_starts(starts, wb)

    def body(canvas, chunk):
        return _accumulate_window_chunk(
            apply_fn, images, canvas, chunk, wb, (wh, ww)), None

    canvas, _ = jax.lax.scan(body, canvas, jnp.asarray(starts_w))
    return canvas / jnp.asarray(counts)[None]


def _chunk_weighted_starts(starts: np.ndarray, wb: int, multiple: int = 1) -> np.ndarray:
    """[K, 2] window starts -> [K'/wb, wb, 3] (y, x, weight) chunks, padded
    with zero-weight sentinel windows at (0, 0) so K' is a multiple of
    ``wb * multiple`` (``multiple`` > 1 for device-sharded sweeps)."""
    kk = len(starts)
    pad = (-kk) % (wb * multiple)
    return np.concatenate(
        [np.c_[starts, np.ones((kk, 1), np.int32)], np.zeros((pad, 3), np.int32)],
        axis=0,
    ).reshape(-1, wb, 3)


def _accumulate_window_chunk(apply_fn, images, canvas, chunk, wb, window_hw):
    """Run one chunk of ``wb`` windows as a single ``wb * n``-batch forward
    and add each window's weighted logits onto the canvas. The per-window
    weight (0 for sentinel padding, else 1) costs one elementwise multiply
    per window — noise next to the forward it guards."""
    n, _, _, c = images.shape
    k = canvas.shape[-1]
    wh, ww = window_hw
    wins = [
        jax.lax.dynamic_slice(images, (0, chunk[i, 0], chunk[i, 1], 0), (n, wh, ww, c))
        for i in range(wb)
    ]
    logits = apply_fn(jnp.concatenate(wins, axis=0) if wb > 1 else wins[0])
    logits = logits.astype(jnp.float32)
    for i in range(wb):
        li = logits[i * n : (i + 1) * n] * chunk[i, 2].astype(jnp.float32)
        cur = jax.lax.dynamic_slice(canvas, (0, chunk[i, 0], chunk[i, 1], 0), (n, wh, ww, k))
        canvas = jax.lax.dynamic_update_slice(canvas, cur + li, (0, chunk[i, 0], chunk[i, 1], 0))
    return canvas


def inference_with_sliding_window_sharded(
    apply_fn: Callable[[jax.Array], jax.Array],
    images: jax.Array,
    crop_size: tuple[int, int],
    mesh,
    stride_rate: float = 2.0 / 3.0,
    axis: str = "data",
    window_batch: int = 1,
) -> jax.Array:
    """Device-parallel sliding window: the window grid is sharded over the
    mesh's ``axis`` so a single huge image's sweep scales with device count
    (beyond the reference, which sweeps serially per replica). Windows are
    padded to a device multiple with zero-weight sentinels; partial
    canvases psum over ICI. ``window_batch`` additionally folds that many
    of each device's windows into the batch dim per forward (see
    ``inference_with_sliding_window``).
    """
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    n, h, w, c = images.shape
    starts, counts, (wh, ww) = sliding_window_plan((h, w), crop_size, stride_rate)
    n_dev = mesh.shape[axis]

    k = len(starts)
    wb = max(1, min(int(window_batch), -(-k // n_dev)))
    # [K'/wb chunks, wb, 3] with K' a multiple of n_dev * wb
    starts_arr = _chunk_weighted_starts(starts, wb, multiple=n_dev)

    out_shape = jax.eval_shape(
        apply_fn, jax.ShapeDtypeStruct((n, wh, ww, c), images.dtype)
    )
    nc = out_shape.shape[-1]

    def worker(images_rep, my_starts):
        # my_starts: [K'/(n_dev*wb), wb, 3]
        canvas = jnp.zeros((n, h, w, nc), jnp.float32)

        def body(canvas, chunk):
            return _accumulate_window_chunk(
                apply_fn, images_rep, canvas, chunk, wb, (wh, ww)), None

        canvas, _ = jax.lax.scan(body, canvas, my_starts)
        return jax.lax.psum(canvas, axis)

    sharded = shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    canvas = sharded(images, jnp.asarray(starts_arr))
    return canvas / jnp.asarray(counts)[None]


def inference_fn(
    apply_fn: Callable,
    images: jax.Array,
    sliding_window_crop_size: Optional[tuple[int, int]] = None,
    sliding_window_stride_rate: float = 2.0 / 3.0,
    sliding_window_batch: int = 1,
) -> jax.Array:
    """Dispatch direct vs sliding-window (reference ``core_inference.py:46``)."""
    if sliding_window_crop_size is not None:
        return inference_with_sliding_window(
            apply_fn,
            images,
            sliding_window_crop_size,
            sliding_window_stride_rate,
            window_batch=sliding_window_batch,
        )
    return apply_fn(images)


def _resized_to_scale(images: jax.Array, scale_rate: float) -> jax.Array:
    """Bilinear resize to ``scale_rate`` (shared by the serial and the
    flip-pair paths — the bit-parity claim between them depends on both
    using the exact same scaling policy)."""
    if scale_rate == 1.0:
        return images
    sh, sw = scaled_size(images.shape[1], images.shape[2], scale_rate)
    return resize_image(images, (sh, sw), "bilinear")


def inference_with_scale(
    apply_fn: Callable,
    images: jax.Array,
    scale_rate: float,
    flipped: bool = False,
    **sliding_kwargs,
) -> jax.Array:
    """Resize -> (flip) -> infer -> unflip -> resize logits back
    (reference ``core_model.py:132-225`` ``inference_with_scale``)."""
    h, w = images.shape[1], images.shape[2]
    x = _resized_to_scale(images, scale_rate)
    if flipped:
        x = x[:, :, ::-1, :]
    logits = inference_fn(apply_fn, x, **sliding_kwargs)
    if flipped:
        logits = logits[:, :, ::-1, :]
    if logits.shape[1:3] != (h, w):
        logits = resize_image(logits.astype(jnp.float32), (h, w), "bilinear")
    return logits.astype(jnp.float32)


def inference_with_scale_flip_pair(
    apply_fn: Callable,
    images: jax.Array,
    scale_rate: float,
    **sliding_kwargs,
) -> jax.Array:
    """Run the (identity, horizontal-flip) pair as ONE forward at 2x batch
    and return the SUM of the two logit maps (the caller counts 2 passes).

    Exactly equal (up to fp reassociation) to two serial
    ``inference_with_scale`` calls: the logit resize back to input
    resolution is bilinear, hence linear, so resize(l1 + unflip(l2)) ==
    resize(l1) + resize(unflip(l2)). Eval-mode forwards are per-sample, so
    doubling the batch changes utilization, not results. The reference
    runs each flip as its own ``strategy.run`` pass
    (``core_model.py:232-326``)."""
    n, h, w = images.shape[0], images.shape[1], images.shape[2]
    x = _resized_to_scale(images, scale_rate)
    xx = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
    logits = inference_fn(apply_fn, xx, **sliding_kwargs).astype(jnp.float32)
    summed = logits[:n] + logits[n:, :, ::-1, :]
    if summed.shape[1:3] != (h, w):
        summed = resize_image(summed, (h, w), "bilinear")
    return summed.astype(jnp.float32)


def inference_with_multi_scales(
    apply_fn: Callable,
    images: jax.Array,
    scale_rates: Sequence[float] = (1.0,),
    flip: bool = False,
    flip_in_batch: bool = False,
    **sliding_kwargs,
) -> jax.Array:
    """Average logits over scales x flips
    (reference ``core_model.py:232-326``).

    ``flip_in_batch=True`` folds each scale's flip pair into one forward
    at double batch (see ``inference_with_scale_flip_pair``) — half the
    model calls at better MXU feed, identical results."""
    acc = None
    count = 0
    for scale in scale_rates:
        if flip and flip_in_batch:
            logits = inference_with_scale_flip_pair(
                apply_fn, images, scale, **sliding_kwargs
            )
            acc = logits if acc is None else acc + logits
            count += 2
            continue
        for flipped in ((False, True) if flip else (False,)):
            logits = inference_with_scale(
                apply_fn, images, scale, flipped=flipped, **sliding_kwargs
            )
            acc = logits if acc is None else acc + logits
            count += 1
    return acc / count
