"""Shared endpoint-selection helper for pyramid heads.

Pyramid heads want the ``n`` coarsest DISTINCT strides in fine->coarse
order. Selecting ``endpoints[-n:]`` positionally assumes the endpoint
list is strictly fine->coarse, which is the usual backbone contract but
NOT universal: HRNet (reference ``hrnet.py:535-536`` parity) appends its
os4 HRNetV2 concat after the four branches, so ``[-3:]`` there would
silently treat an os4 tensor as the coarsest pyramid level.
"""

from __future__ import annotations


def select_pyramid_endpoints(endpoints, n: int) -> list:
    """The ``n`` coarsest distinct-resolution endpoints, fine -> coarse.

    Ties at one resolution keep the LAST tensor (later endpoints are the
    richer/fused ones). Falls back to ``endpoints[-n:]`` for non-spatial
    entries."""
    if not isinstance(endpoints, (list, tuple)):
        return [endpoints]
    spatial = [e for e in endpoints
               if hasattr(e, "shape") and len(e.shape) == 4]
    if len(spatial) < n:
        return list(endpoints[-n:])
    by_res: dict = {}
    for e in spatial:  # last one at a resolution wins
        by_res[(int(e.shape[1]), int(e.shape[2]))] = e
    # coarse = smallest spatial size; output ordered fine -> coarse
    ordered = sorted(by_res.items(), key=lambda kv: -(kv[0][0] * kv[0][1]))
    if len(ordered) < n:
        return list(endpoints[-n:])
    return [e for _, e in ordered[-n:]]
