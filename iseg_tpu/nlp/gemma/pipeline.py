"""Pipeline-parallel Gemma training (TPU-native addition).

The reference trains Gemma with DP and (optionally) the TP layout map only
(``nlp/gemma/gemma_backbone.py:200-271``); it has no pipeline parallelism
(SURVEY.md §2.2). This module stages the decoder stack over a ``stage``
mesh axis with :func:`iseg_tpu.parallel.pipeline.pipeline_spmd`:

* the ``num_layers`` homogeneous decoder blocks are stacked into one
  pytree with a leading layer axis, reshaped ``[stages, layers/stage]``
  and sharded over ``stage`` — each device owns its stage's weights and
  runs them as a ``lax.scan`` over its local layers;
* embedding, final norm, and the tied-embedding readout are replicated
  (computed identically on every device, outside the shard_map) — they
  are a tiny fraction of the FLOPs and this keeps their gradients simple;
* only the [B, T] positions ride the pipeline as per-microbatch
  constants (indexed locally, never ppermuted); each stage rebuilds the
  [mb, 1, T, T] causal mask per microbatch on the fly, so the O(B*T^2)
  mask bytes are transient, never a resident replicated stack;
* the whole thing is differentiable, so one ``jax.value_and_grad`` gives
  a pipeline-parallel train step whose per-stage grads live on the stage
  owner. Compose with DP via ``batch_axis`` on a 2-D ``(data, stage)``
  mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from iseg_tpu.nlp.gemma.config import GemmaConfig
from iseg_tpu.nlp.gemma.model import (
    GemmaDecoderBlock,
    RMSNorm,
    causal_mask,
)
from iseg_tpu.ops.quant import QuantEmbed
from iseg_tpu.parallel.pipeline import pipeline_spmd, stack_params

__all__ = [
    "to_pipeline_params",
    "from_pipeline_params",
    "make_pp_loss_fn",
]


def to_pipeline_params(params: Any, num_stages: int):
    """Split backbone params into (staged_blocks, shared).

    ``staged_blocks`` leaves are ``[num_stages, layers_per_stage, ...]``
    (shard the leading axis over the stage mesh axis); ``shared`` holds
    the embedding and final norm, replicated.
    """
    layer_keys = sorted(
        (k for k in params if k.startswith("layer_")),
        key=lambda k: int(k.split("_")[1]),
    )
    n_layers = len(layer_keys)
    if n_layers % num_stages != 0:
        raise ValueError(
            f"{n_layers} layers not divisible by {num_stages} stages"
        )
    lps = n_layers // num_stages
    stacked = stack_params([params[k] for k in layer_keys])  # [L, ...]
    staged = jax.tree_util.tree_map(
        lambda x: x.reshape(num_stages, lps, *x.shape[1:]), stacked
    )
    shared = {k: v for k, v in params.items() if not k.startswith("layer_")}
    return staged, shared


def from_pipeline_params(staged: Any, shared: Any) -> Any:
    """Inverse of :func:`to_pipeline_params`."""
    leaves = jax.tree_util.tree_leaves(staged)
    s, lps = leaves[0].shape[:2]
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape(s * lps, *x.shape[2:]), staged
    )
    params = dict(shared)
    for i in range(s * lps):
        params[f"layer_{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], flat
        )
    return params


def make_pp_loss_fn(
    config: GemmaConfig,
    mesh: Mesh,
    stage_axis: str = "stage",
    num_microbatches: int = 4,
    batch_axis: Optional[str] = None,
    dtype: Any = None,
    param_dtype: Any = jnp.float32,
):
    """Next-token LM loss with the decoder stack pipelined over
    ``stage_axis``.

    Returns ``loss_fn(staged, shared, token_ids, weights)`` — jit it and
    take ``jax.value_and_grad`` over args ``(0, 1)`` for a PP train step.
    ``weights [B, T]`` masks padding; targets are ``token_ids`` shifted
    left (the causal-LM preprocessor convention,
    ``gemma_causal_lm_preprocessor.py``).
    """
    block = GemmaDecoderBlock(
        config=config, dtype=dtype, param_dtype=param_dtype
    )
    embed = QuantEmbed(
        config.vocab_size, config.hidden_dim, dtype=dtype,
        param_dtype=param_dtype,
    )
    final_norm = RMSNorm(
        epsilon=config.layer_norm_epsilon, param_dtype=param_dtype
    )

    def stage_fn(p_stage, hidden, const):
        # const carries only the [mb, T] positions; the [mb, 1, T, T]
        # causal mask is built per-microbatch HERE so no [M, mb, 1, T, T]
        # mask stack (O(B*T^2) bytes) ever rides the replicated const
        positions = const
        mask = causal_mask(positions.shape[1], positions)

        def body(h, p_layer):
            out, _ = block.apply(
                {"params": p_layer}, h, positions, mask=mask
            )
            return out, None

        hidden, _ = jax.lax.scan(body, hidden, p_stage)
        return hidden

    pp = pipeline_spmd(
        stage_fn, mesh, stage_axis, num_microbatches, batch_axis=batch_axis
    )

    def loss_fn(staged, shared, token_ids, weights):
        b, t = token_ids.shape
        positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))

        x = embed.apply({"params": shared["token_embedding"]}, token_ids)
        x = x * jnp.asarray(config.hidden_dim ** 0.5, x.dtype)

        x = pp(staged, x, const=positions)

        x = final_norm.apply({"params": shared["final_normalization"]}, x)
        logits = embed.apply(
            {"params": shared["token_embedding"]},
            x.astype(jnp.float32),
            method=QuantEmbed.attend,
        )

        targets = token_ids[:, 1:]
        w = weights[:, 1:].astype(jnp.float32)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    return loss_fn
