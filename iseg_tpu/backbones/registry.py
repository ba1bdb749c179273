"""Backbone name registry + dispatch.

Parity with the reference's ``backbones/backbone_registry.py:5``
``register_backbone`` and ``backbones/feature_extractor.py:35``
``get_backbone`` (name -> constructor dispatch :78-137, atrous dispatch
:139-149, weight loading :166-187 — weight ingest lives in
``iseg_tpu.core.checkpoint``).
"""

from __future__ import annotations

from typing import Callable, Optional

_REGISTRY: dict[str, Callable] = {}


def register_backbone(name: str, constructor: Optional[Callable] = None):
    """Register a backbone constructor; usable as a decorator."""

    def _register(ctor):
        if name in _REGISTRY:
            raise ValueError(f"backbone {name!r} already registered")
        _REGISTRY[name] = ctor
        return ctor

    if constructor is not None:
        return _register(constructor)
    return _register


def list_backbones() -> list[str]:
    _ensure_builtins()
    return sorted(_REGISTRY)


_BUILTIN_IMPORT_ERRORS: dict[str, str] = {}


def _ensure_builtins():
    # Import-time registration of the built-in zoo (lazy to avoid cycles).
    # Import failures are RECORDED, not swallowed: a typo'd import inside
    # a backbone module must not degrade into an unexplained "unknown
    # backbone" KeyError later (get_backbone re-surfaces the cause).
    for mod in (
        "mobilenetv2",
        "resnet",
        "xception",
        "efficientnet",
        "hrnet",
        "convnext",
        "swin",
        "vit",
        "mlp_mixer",
        "moat",
        "eva",
        "intern_image",
        "placeholder",
    ):
        try:
            __import__(f"iseg_tpu.backbones.{mod}")
            _BUILTIN_IMPORT_ERRORS.pop(mod, None)  # recovered on retry
        except ImportError as e:
            _BUILTIN_IMPORT_ERRORS[mod] = repr(e)


def get_backbone(
    name: str,
    output_stride: int = 32,
    return_endpoints: bool = True,
    **kwargs,
):
    """Name -> constructed backbone module
    (reference ``backbones/feature_extractor.py:35``)."""
    _ensure_builtins()
    if name not in _REGISTRY:
        extra = (f"; builtin modules that FAILED to import: "
                 f"{_BUILTIN_IMPORT_ERRORS}" if _BUILTIN_IMPORT_ERRORS else "")
        raise KeyError(
            f"unknown backbone {name!r}; registered: {sorted(_REGISTRY)}{extra}"
        )
    return _REGISTRY[name](
        output_stride=output_stride, return_endpoints=return_endpoints, **kwargs
    )
