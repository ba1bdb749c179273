"""Pallas TPU kernel tier.

The reference's perf-critical tier is XLA-jitted TF functions (SURVEY.md
§2, starred components); here the hot paths get hand-written Pallas kernels
behind jitted-JAX fallbacks, so kernels are perf work, not correctness work.
"""

from iseg_tpu.ops.pallas.upsample_ce import (
    upsample_cross_entropy,
    upsample_cross_entropy_reference,
)
from iseg_tpu.ops.pallas.window_attention import (
    window_attention,
    window_attention_reference,
)

__all__ = [
    "upsample_cross_entropy",
    "upsample_cross_entropy_reference",
    "window_attention",
    "window_attention_reference",
]
