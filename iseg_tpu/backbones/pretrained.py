"""Pretrained backbone loading: construct + ingest + DCN auto-calibration.

The reference's ``get_backbone(name, weights_path=...)`` builds the model
and loads published weights in one call
(``backbones/feature_extractor.py:35,166-187``). This module is that
capstone for the flax split (module vs variables), plus a TPU-specific
safety step the reference doesn't need: when the ingested checkpoint holds
DCNv3 offset heads, :func:`auto_calibrate_dcn` measures each layer's
actual max effective offset on a sample forward and pins a per-block
sampling mode — the gather-free dense-local fast path with the smallest
exact clamp, or the reference-exact gather path when trained offsets are
too large for any practical clamp (VERDICT r2 #5: "auto" must be safe for
arbitrary pretrained checkpoints by construction, not by the user knowing
to call the calibration API).
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional, Union

import jax
import jax.numpy as jnp

from iseg_tpu.backbones.registry import get_backbone

# family -> weight_maps builder, matched by longest name prefix
_FAMILY_MAPS: dict[str, str] = {
    "resnet": "keras_resnet_name_map",
    "mobilenetv2": "keras_mobilenetv2_name_map",
    "efficientnet": "efficientnet_name_map",
    "xception": "xception_name_map",
    "convnext": "convnext_name_map",
    "swin": "swin_name_map",
    "vit": "vit_name_map",
    "mlp_mixer": "mlp_mixer_name_map",
    "eva": "eva_name_map",
    "hrnet": "hrnet_name_map",
    "intern_image": "intern_image_name_map",
    "moat": "moat_name_map",
}


def name_map_for(backbone_name: str) -> Optional[Callable]:
    """The weight-name map builder for a backbone family (None when the
    heuristic matcher in ``h5_ingest`` should be used instead)."""
    from iseg_tpu.core import weight_maps

    best = None
    for prefix, fn_name in _FAMILY_MAPS.items():
        if backbone_name.startswith(prefix) and (
            best is None or len(prefix) > len(best[0])
        ):
            best = (prefix, fn_name)
    return getattr(weight_maps, best[1]) if best else None


def auto_calibrate_dcn(
    model,
    variables,
    sample_input,
    max_dense_r: int = 6,
    margin: float = 0.5,
):
    """Measure trained DCN offsets and pin per-block sampling modes.

    Returns ``(model, report)`` — ``model`` is rebuilt with
    ``dcn_overrides`` when it exposes that field and any DCN layer was
    found; ``report`` is :func:`~iseg_tpu.nn.dcn.calibrate_dcn_sampling`'s
    per-layer table (empty for DCN-free models)."""
    from iseg_tpu.nn.dcn import calibrate_dcn_sampling

    report = calibrate_dcn_sampling(
        model, variables, sample_input, max_dense_r=max_dense_r,
        margin=margin,
    )
    if report and hasattr(model, "dcn_overrides"):
        overrides = {}
        for layer_path, rec in report.items():
            block = layer_path.split("/")[0]
            overrides[block] = (
                rec["recommended_sampling"],
                max(int(rec["recommended_r"]), 1),
            )
        model = model.clone(dcn_overrides=overrides)
    return model, report


def load_pretrained_backbone(
    name: str,
    weights_path: Optional[str] = None,
    *,
    input_size: tuple[int, int] = (64, 64),
    name_map: Union[str, Mapping, Callable, None] = "auto",
    calibrate_dcn: bool = True,
    calibration_input=None,
    strict: bool = False,
    rng_seed: int = 0,
    **kwargs,
):
    """Build a backbone, ingest pretrained weights, auto-calibrate DCN.

    Reference parity: ``get_backbone(name, weights_path=...)``
    (``feature_extractor.py:35``) plus the build-by-forward step
    (``:153-164``). Returns ``(model, variables, report)`` where report
    holds the ingest summary (``"weights"``) and the DCN calibration table
    (``"dcn_calibration"``) when applicable.

    ``name_map="auto"`` resolves the family's published-checkpoint name
    table (``core/weight_maps.py``); pass an explicit mapping/callable for
    custom files, or ``None`` for the heuristic matcher.

    ``calibration_input`` should be a REAL preprocessed sample batch when
    available — trained offset heads are input-dependent, so measuring on
    representative data gives the tightest safe clamp. The default is a
    seeded random batch (plus the calibration margin), which exercises the
    offset weights; an all-zeros probe would only see the biases."""
    model = get_backbone(name, **kwargs)
    x = jnp.zeros((1, input_size[0], input_size[1], 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(rng_seed), x)
    report: dict = {}

    if weights_path is not None:
        from iseg_tpu.core.h5_ingest import load_h5_weights_by_name

        # weight maps address paths below a "backbone" segment (the
        # SegManaged composition layout); wrap, ingest, unwrap. User-
        # supplied maps/resolvers address the UNWRAPPED paths they can
        # actually see ("params/stem/..."), so translate both ways.
        wrapped = {coll: {"backbone": variables[coll]} for coll in variables}

        def _wrap_key(k: str) -> str:
            segs = k.split("/")
            if len(segs) > 1 and segs[1] == "backbone":
                return k  # already wrapped (family maps build from wrapped)
            return "/".join([segs[0], "backbone", *segs[1:]])

        def _unwrap_key(k: str) -> str:
            segs = k.split("/")
            if len(segs) > 1 and segs[1] == "backbone":
                return "/".join([segs[0], *segs[2:]])
            return k

        mapping = name_map
        if name_map == "auto":
            map_fn = name_map_for(name)
            mapping = map_fn(wrapped) if map_fn else None
        elif callable(name_map):
            # a family-style builder returns a dict from the variables;
            # anything else is h5_ingest's str->str resolver contract.
            # Only the signature-mismatch errors a str->str resolver
            # would raise on a pytree are probed — a genuine bug inside a
            # dict builder (e.g. KeyError) must propagate, not be
            # silently reclassified
            try:
                built = name_map(wrapped)
            except (TypeError, AttributeError):
                built = None
            if isinstance(built, dict):
                mapping = built
            else:
                mapping = lambda p, _fn=name_map: _fn(_unwrap_key(p))
        if isinstance(mapping, dict):
            mapping = {_wrap_key(k): v for k, v in mapping.items()}
        wrapped, load_report = load_h5_weights_by_name(
            wrapped, weights_path, name_map=mapping, strict=strict
        )
        variables = {coll: wrapped[coll]["backbone"] for coll in wrapped}
        report["weights"] = load_report

    if calibrate_dcn:
        if calibration_input is None:
            # random probe in normalized-image range: activates the
            # input-dependent part of the offset heads, unlike zeros
            calibration_input = jax.random.uniform(
                jax.random.PRNGKey(rng_seed + 1),
                (2, input_size[0], input_size[1], 3),
                minval=-1.0, maxval=1.0)
        model, calib = auto_calibrate_dcn(model, variables,
                                          calibration_input)
        if calib:
            report["dcn_calibration"] = calib
    return model, variables, report
