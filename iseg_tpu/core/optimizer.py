"""Optimizer factory on optax.

Parity with the reference's ``core_optimizer.py:18`` ``get_optimizer``
(poly/cosine LR schedules with warmup :132-160; SGD/Adam/AMSGrad/AdamW
:163-188; list-valued kwargs -> multiple optimizers :55-106), the
``lr_multiplier`` mechanism of ``optimizers/modern/adamw.py:17-19`` /
``utils/layerwise_decay.py:12``, the weight-decay exclusion lists of
``utils/train_utils.py:8-37``, the NaN-replacing gradient clip of
``optimizers/modern/adamw.py:63-73``, and ``optimizers/multi_optimizer.py:10``.

TPU-first: one optax ``GradientTransformation`` per model — per-variable lr
multipliers, no-decay masks, and layer partitioning all become masked /
labeled transforms, so the whole update stays a single fused XLA program.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Mapping, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

# Name fragments excluded from weight decay, per the reference's no-decay
# list (``utils/train_utils.py:8-37``): norm params, biases, positional
# embeddings, class tokens, relative-position tables.
NO_WEIGHT_DECAY_PATTERNS = (
    "bias",
    "scale",            # flax norm scale ("gamma")
    "norm",
    "bn",
    "pos_embed",
    "position_embedding",
    "cls_token",
    "class_token",
    "relative_position",
    "gamma",
    "beta",
    "logit_scale",
    "logits",           # the reference excludes logits convs (:23)
    "patch_embed",
)


def warmup_poly_decay(
    base_learning_rate: float,
    decay_steps: int,
    end_learning_rate: float = 0.0,
    power: float = 0.9,
    warmup_steps: int = 0,
    warmup_learning_rate: float = 0.0,
    ref_exact: bool = False,
) -> optax.Schedule:
    """Poly decay with linear warmup
    (reference ``optimizers/polydecay.py:44-76`` ``WarmUpPolyDecay``).

    Default semantics anneal to ``end_learning_rate`` exactly at
    ``decay_steps`` (standard DeepLab poly). The reference has a quirk
    (``polydecay.py:53-55``): it clamps the step to
    ``decay_steps - warmup_steps`` BEFORE subtracting the warmup, so with
    warmup its decay progress tops out at ``1 - warmup/max_steps`` and
    the LR never reaches the end value. ``ref_exact=True`` reproduces
    that behavior bit-for-bit (oracle-tested) for runs that must match
    reference training dynamics."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_learning_rate + (base_learning_rate - warmup_learning_rate) * (
            step / jnp.maximum(1.0, warmup_steps)
        )
        decay_total = jnp.maximum(1.0, decay_steps - warmup_steps)
        if ref_exact:
            cur = jnp.minimum(step, decay_total)
            p = jnp.clip((cur - warmup_steps) / decay_total, 0.0, 1.0)
        else:
            p = jnp.clip((step - warmup_steps) / decay_total, 0.0, 1.0)
        decayed = (base_learning_rate - end_learning_rate) * (1.0 - p) ** power
        decayed = decayed + end_learning_rate
        if warmup_steps <= 0:
            return decayed
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def warmup_cosine_decay(
    base_learning_rate: float,
    decay_steps: int,
    alpha: float = 0.0,
    warmup_steps: int = 0,
) -> optax.Schedule:
    """Cosine decay with linear warmup
    (reference ``optimizers/cosinedecay.py:7``)."""
    if warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=base_learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=decay_steps,
            end_value=alpha * base_learning_rate,
        )
    return optax.cosine_decay_schedule(base_learning_rate, decay_steps, alpha=alpha)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts).lower()


def weight_decay_mask(
    params,
    extra_no_decay: Sequence[str] = (),
) -> Any:
    """Bool pytree: True where weight decay applies
    (reference ``utils/train_utils.py:40-72``)."""
    patterns = tuple(NO_WEIGHT_DECAY_PATTERNS) + tuple(extra_no_decay)

    def decide(path, leaf):
        s = _path_str(path)
        return not any(p in s for p in patterns)

    return jax.tree_util.tree_map_with_path(decide, params)


def lr_multiplier_tree(
    params,
    multipliers: Mapping[str, float],
    default: float = 1.0,
) -> Any:
    """Per-leaf lr multipliers from {name-regex: multiplier}
    (reference ``optimizers/modern/adamw.py:17-19``,
    ``utils/train_utils.py:75-88``)."""
    compiled = [(re.compile(k), v) for k, v in multipliers.items()]

    def decide(path, leaf):
        s = _path_str(path)
        for rx, v in compiled:
            if rx.search(s):
                return v
        return default

    return jax.tree_util.tree_map_with_path(decide, params)


def scale_by_lr_multipliers(multiplier_tree) -> optax.GradientTransformation:
    """optax transform applying a static per-leaf multiplier to updates.

    Multipliers are matched by PATH, not tree structure: under
    ``optax.multi_transform`` the masked update tree replaces non-group
    leaves with ``MaskedNode`` (zero leaves), so a structural
    ``tree_map(updates, multiplier_tree)`` would raise on the first step
    of any multi-optimizer + lr_multipliers combination."""
    flat = {path: m for path, m in
            jax.tree_util.tree_flatten_with_path(multiplier_tree)[0]}

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u: u * flat.get(path, 1.0), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def layerwise_decay_multipliers(
    params,
    decay_rate: float,
    layer_index_fn: Callable[[str], Optional[int]],
    num_layers: int,
) -> Any:
    """Layerwise LR decay: multiplier = decay_rate ** (num_layers - i)
    (reference ``backbones/utils/layerwise_decay.py:12`` ``decay_layers_lr``,
    used by EVA/ConvNeXt ``backbones/eva/eva.py:254``)."""

    def decide(path, leaf):
        s = _path_str(path)
        idx = layer_index_fn(s)
        if idx is None:
            return 1.0
        return decay_rate ** max(0, num_layers - idx)

    return jax.tree_util.tree_map_with_path(decide, params)


class KerasAdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any
    nu_hat: Any  # None unless amsgrad


def keras_adamw(
    schedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
    weight_decay: float = 0.0,
    wd_mask=None,
    multiplier_tree=None,
    amsgrad: bool = False,
) -> optax.GradientTransformation:
    """The EXACT Keras-3 Adam/AdamW/AMSGrad step, as one terminal transform
    (produces the final signed update — no ``scale_by_learning_rate``
    after it).

    The reference trains through ``AdamW_EXT``
    (``optimizers/modern_k3/adamw.py:6-47``) on the Keras-3 base
    optimizer. Two places where that differs from the optax chain:

    * eps placement: Keras computes ``lr*mult * a_t * m / (sqrt(v)+eps)``
      with ``a_t = sqrt(1-b2^t)/(1-b1^t)`` — equivalent to optax's
      ``m_hat/(sqrt(v_hat)+eps_hat)`` only with a step-DEPENDENT
      ``eps_hat = eps/sqrt(1-b2^t)``.
    * decoupled weight decay uses the BASE scheduled lr, NOT the
      per-variable ``lr_multiplier`` (``_apply_weight_decay`` in
      keras base_optimizer: ``w -= w*wd*lr`` before ``update_step``,
      exclusions via ``exclude_from_weight_decay`` —
      ``utils/train_utils.py:40-72``).

    Trajectory parity with the reference's AdamW path requires both.
    """

    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return KerasAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=z,
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu_hat=(jax.tree_util.tree_map(jnp.zeros_like, params)
                    if amsgrad else None),
        )

    def update_fn(updates, state, params=None):
        if weight_decay and params is None:
            raise ValueError("keras_adamw with weight_decay needs params")
        t = state.count + 1
        lr = jnp.asarray(schedule(state.count), jnp.float32)
        tf_ = t.astype(jnp.float32)
        bias = jnp.sqrt(1.0 - b2 ** tf_) / (1.0 - b1 ** tf_)
        mu = jax.tree_util.tree_map(
            lambda m, g: m + (g - m) * (1.0 - b1), state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: v + (g * g - v) * (1.0 - b2), state.nu, updates)
        if amsgrad:
            nu_hat = jax.tree_util.tree_map(jnp.maximum, state.nu_hat, nu)
            denom_tree = nu_hat
        else:
            nu_hat = None
            denom_tree = nu

        mults = None
        if multiplier_tree is not None:
            mults = {p: m for p, m in
                     jax.tree_util.tree_flatten_with_path(multiplier_tree)[0]}
        masks = None
        if wd_mask is not None:
            masks = {p: m for p, m in
                     jax.tree_util.tree_flatten_with_path(wd_mask)[0]}

        def step(path, m, v, w):
            mult = mults.get(path, 1.0) if mults is not None else 1.0
            u = (lr * mult * bias) * m / (jnp.sqrt(v) + eps)
            if weight_decay and (masks is None or masks.get(path, True)):
                u = u + lr * weight_decay * w
            return -u

        if params is None:
            params = jax.tree_util.tree_map(lambda m: 0.0, mu)
        flat_mu, treedef = jax.tree_util.tree_flatten_with_path(mu)
        flat_v = jax.tree_util.tree_leaves(denom_tree)
        flat_w = jax.tree_util.tree_leaves(params)
        out = [step(path, m, v, w)
               for (path, m), v, w in zip(flat_mu, flat_v, flat_w)]
        new_updates = jax.tree_util.tree_unflatten(treedef, out)
        return new_updates, KerasAdamState(t, mu, nu, nu_hat)

    return optax.GradientTransformation(init_fn, update_fn)


def scrub_nonfinite() -> optax.GradientTransformation:
    """Replace NaN/Inf gradients with zero before the update
    (reference ``optimizers/modern/adamw.py:63-73``)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def get_optimizer(
    params,
    name: str = "sgd",
    learning_rate: float = 0.007,
    end_learning_rate: float = 0.0,
    train_steps: int = 30000,
    warmup_steps: int = 0,
    warmup_learning_rate: float = 0.0,
    decay_strategy: Optional[str] = "poly",
    poly_power: float = 0.9,
    sgd_momentum: float = 0.9,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_epsilon: float = 1e-8,
    weight_decay: float = 0.0,
    clip_norm: Optional[float] = None,
    lr_multipliers: Optional[Mapping[str, float]] = None,
    extra_no_decay: Sequence[str] = (),
    scrub_nan_grads: bool = True,
    keras_momentum: bool = False,
    keras_adam: bool = False,
    poly_ref_exact: bool = False,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Build the optimizer + schedule (reference ``core_optimizer.py:18``).

    Returns ``(tx, schedule)``; the schedule is also returned so drivers can
    log the current LR (the reference reads it off the Keras optimizer).

    Multi-optimizer training (list-valued kwargs in the reference,
    ``core_optimizer.py:55-106``) is covered by :func:`get_multi_optimizer`.

    ``keras_momentum`` switches SGD to Keras's velocity formulation
    ``v_t = m*v_{t-1} - lr_t*g_t; w += v_t`` (keras/src/optimizers/sgd.py,
    the optimizer the reference trains with via ``core_optimizer.py:163``).
    The optax default ``w -= lr_t*(m*v_{t-1} + g_t)`` is identical under a
    CONSTANT learning rate but diverges under a schedule (Keras's velocity
    carries each step's own LR; optax re-scales the whole trace by the
    current LR). Trajectory parity with the reference requires the Keras
    ordering. ``poly_ref_exact`` selects the reference's poly-warmup clamp
    quirk (see :func:`warmup_poly_decay`).
    """
    if decay_strategy in ("poly", "polynomial"):
        schedule = warmup_poly_decay(
            learning_rate,
            train_steps,
            end_learning_rate=end_learning_rate,
            power=poly_power,
            warmup_steps=warmup_steps,
            warmup_learning_rate=warmup_learning_rate,
            ref_exact=poly_ref_exact,
        )
    elif decay_strategy == "cosine":
        schedule = warmup_cosine_decay(
            learning_rate, train_steps, warmup_steps=warmup_steps,
            # the floor LR must not be silently ignored for cosine
            alpha=(end_learning_rate / learning_rate
                   if learning_rate else 0.0),
        )
    elif decay_strategy in (None, "none", "constant"):
        schedule = optax.constant_schedule(learning_rate)
    else:
        raise ValueError(f"unknown decay strategy: {decay_strategy!r}")

    chain = []
    if scrub_nan_grads:
        chain.append(scrub_nonfinite())
    if clip_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_norm))

    name = name.lower()
    if name == "sgd":
        if not keras_momentum:
            chain.append(optax.trace(decay=sgd_momentum, nesterov=False))
        if weight_decay:
            chain.append(
                optax.add_decayed_weights(
                    weight_decay, mask=lambda p: weight_decay_mask(p, extra_no_decay)
                )
            )
    elif name in ("adam", "amsgrad", "adamw") and keras_adam:
        # the reference's exact Keras-3 update (see keras_adamw docstring);
        # lr schedule, multipliers, and decoupled base-lr decay are all
        # inside the one transform — nothing else goes on the chain
        chain.append(keras_adamw(
            schedule, b1=adam_beta1, b2=adam_beta2, eps=adam_epsilon,
            weight_decay=weight_decay if name == "adamw" else 0.0,
            wd_mask=(weight_decay_mask(params, extra_no_decay)
                     if (weight_decay and name == "adamw") else None),
            multiplier_tree=(lr_multiplier_tree(params, lr_multipliers)
                             if lr_multipliers else None),
            amsgrad=name == "amsgrad",
        ))
        return optax.chain(*chain), schedule
    elif name in ("adam", "amsgrad"):
        scale_by = (optax.scale_by_adam if name == "adam"
                    else optax.scale_by_amsgrad)
        chain.append(
            scale_by(b1=adam_beta1, b2=adam_beta2, eps=adam_epsilon)
        )
        if weight_decay:
            # a requested decay must never silently vanish; for adam this
            # is decoupled (AdamW-style) decay, the reference's Keras
            # optimizers apply the same (keras weight_decay is decoupled)
            chain.append(
                optax.add_decayed_weights(
                    weight_decay, mask=lambda p: weight_decay_mask(p, extra_no_decay)
                )
            )
    elif name == "adamw":
        chain.append(
            optax.scale_by_adam(b1=adam_beta1, b2=adam_beta2, eps=adam_epsilon)
        )
        if weight_decay:
            chain.append(
                optax.add_decayed_weights(
                    weight_decay, mask=lambda p: weight_decay_mask(p, extra_no_decay)
                )
            )
    else:
        raise ValueError(f"unknown optimizer: {name!r}")

    if lr_multipliers:
        chain.append(scale_by_lr_multipliers(lr_multiplier_tree(params, lr_multipliers)))

    chain.append(optax.scale_by_learning_rate(schedule))
    if name == "sgd" and keras_momentum and sgd_momentum:
        # Keras ordering: the velocity accumulates ALREADY-lr-scaled steps,
        # so the trace sits AFTER scale_by_learning_rate
        chain.append(optax.trace(decay=sgd_momentum, nesterov=False))
    return optax.chain(*chain), schedule


def get_optimizer_list(
    params,
    group_patterns: Sequence[str],
    names: Sequence[str],
    learning_rates: Sequence[float],
    default_group: int = 0,
    **common_kwargs,
) -> optax.GradientTransformation:
    """List-valued optimizer construction (reference ``core_optimizer.py:55-106``:
    list-valued kwargs produce one optimizer per entry, routed by parameter
    group). ``group_patterns[i]`` (regex on the param path) selects the
    params handled by optimizer i; unmatched params go to ``default_group``.
    """
    if not (len(group_patterns) == len(names) == len(learning_rates)):
        raise ValueError("group_patterns/names/learning_rates must align")

    compiled = [(i, re.compile(p)) for i, p in enumerate(group_patterns)]

    def label_fn(path_str: str) -> str:
        for i, rx in compiled:
            if rx.search(path_str):
                return str(i)
        return str(default_group)

    optimizers = {
        str(i): get_optimizer(params, name=n, learning_rate=lr, **common_kwargs)[0]
        for i, (n, lr) in enumerate(zip(names, learning_rates))
    }
    return get_multi_optimizer(params, label_fn, optimizers)


def get_multi_optimizer(
    params,
    label_fn: Callable[[str], str],
    optimizers: Mapping[str, optax.GradientTransformation],
) -> optax.GradientTransformation:
    """Layer-partitioned optimizer: route parameter groups to different
    sub-optimizers by name (reference ``optimizers/multi_optimizer.py:38-61``).
    """
    labels = jax.tree_util.tree_map_with_path(
        lambda path, leaf: label_fn(_path_str(path)), params
    )
    return optax.multi_transform(optimizers, labels)


def with_grad_accum(
    tx: optax.GradientTransformation, every: int
) -> optax.GradientTransformation:
    """Gradient accumulation: apply ``tx`` once per ``every`` micro-steps.

    Beyond-reference production feature (the reference has no
    accumulation anywhere): wraps ``tx`` in ``optax.MultiSteps``, which
    keeps a running MEAN of the micro-batch gradients and emits zero
    updates in between — so ``every`` micro-batches of size B are
    numerically one step at global batch ``every * B`` (for a
    per-sample-mean loss), with no extra HBM beyond one grad-shaped
    accumulator. The accumulator leaves mirror parameter shapes, so
    ZeRO/FSDP opt-state sharding (``parallel/fsdp.py``) applies
    leaf-by-leaf unchanged.

    Notes: LR schedules inside ``tx`` count REAL updates (they advance
    once per ``every`` micro-steps); BN batch_stats still update every
    micro-step, matching small-batch BN semantics.
    """
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    if every == 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=every).gradient_transformation()
