"""NAS-FPN head.

Parity with the reference ``layers/nasfpn.py`` (``NASFPN`` :105): the
discovered 7-merging-cell architecture (Ghiasi et al., CVPR 2019) over
pyramid levels P3-P7, repeated ``num_repeats`` times. Reference-exact
semantics reproduced here:

- block specs ``layers/nasfpn.py:37-45`` (incl. rows 5-6
  ``(5,'attention',(7,8))`` / ``(7,'attention',(6,9))``);
- level-based resampling: max-pool ``2^dL`` down / nearest-tile ``2^dL``
  up (``:269-275``, ``nearest_upsampling`` ``:48``);
- ``use_sum_for_combination`` defaulting to True, so attention combines
  only fire when the flag is False (``:120,349``);
- attention operands ordered by pyramid level — the coarser-or-equal
  node gates (``:351-355``);
- output nodes absorb same-level intermediates that have no output
  connections yet (``:360-368``);
- each new node is relu -> 3x3 conv (with bias) -> BN (``:371-382``),
  input projections are 1x1 conv (with bias) -> BN (``:256-267``),
  levels 6/7 extend the pyramid by stride-2 max-pool of the previous
  level (``:210-218``).

One documented divergence: inside a cell the reference resamples through
``_resample_feature_map`` with its DEFAULT ``target_num_filters=256``, so
with ``num_filters != 256`` it inserts extra 256-wide projection convs
whose hardcoded ``name_prefix="resample"`` collides — under Keras 3 that
configuration cannot even construct (duplicate operation names). We treat
the intended semantics (no in-cell convs; features already have
``num_filters`` channels) as the spec for every ``filters`` value.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.nn.conv import ConvNormAct

# (output_level, combine_op, (input_node_a, input_node_b), is_output)
# nodes 0..4 are the input pyramid P3..P7; new nodes append after.
# The discovered NAS-FPN cell, reference ``layers/nasfpn.py:37-45``.
NASFPN_BLOCK_SPECS = (
    (4, "attention", (1, 3), False),
    (4, "sum", (1, 5), False),
    (3, "sum", (0, 6), True),
    (4, "sum", (6, 7), True),
    (5, "attention", (7, 8), True),
    (7, "attention", (6, 9), True),
    (6, "attention", (9, 10), True),
)

_MIN_LEVEL = 3
_MAX_LEVEL = 7


def _nearest_upsample(x, scale: int):
    """Tile-based nearest upsampling, exactly the reference's
    reshape-tile-reshape (``layers/nasfpn.py:66-81``)."""
    if scale == 1:
        return x
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def _resample_by_level(x, in_level: int, target_level: int):
    """Level-delta resample (``layers/nasfpn.py:269-275``): max-pool with
    pool=stride=2^dL down, nearest-tile 2^dL up, identity at same level."""
    if in_level < target_level:
        s = int(2 ** (target_level - in_level))
        return nn.max_pool(x, (s, s), strides=(s, s), padding="SAME")
    if in_level > target_level:
        return _nearest_upsample(x, int(2 ** (in_level - target_level)))
    return x


def _global_attention(feat0, feat1):
    """out = feat0 + feat1 * sigmoid(global_max_pool(feat0))
    (reference ``layers/nasfpn.py:309-318``)."""
    m = jnp.max(feat0, axis=(1, 2), keepdims=True)
    return feat0 + feat1.astype(feat0.dtype) * nn.sigmoid(m)


class NASFPN(nn.Module):
    """NAS-FPN over P3-P7. Input: backbone endpoints (the three coarsest
    distinct strides become P3/P4/P5; P6/P7 are pooled extensions).
    Output: the P3 feature (finest), or the full level->feature dict when
    ``return_all_levels`` is set."""

    filters: int = 256
    num_repeats: int = 5  # reference default (``layers/nasfpn.py:122``)
    block_specs: Sequence = NASFPN_BLOCK_SPECS
    # reference ``layers/nasfpn.py:120``: default True, every combine is a
    # sum; False enables the discovered cell's attention combines.
    use_sum_for_combination: bool = True
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32
    return_all_levels: bool = False

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        common = dict(norm=self.norm, dtype=self.dtype,
                      param_dtype=self.param_dtype)
        from iseg_tpu.nn.heads.common import select_pyramid_endpoints

        feats_in = select_pyramid_endpoints(endpoints, 3)  # -> P3, P4, P5

        # Project backbone levels (1x1 conv WITH bias + BN, no act:
        # reference ``:256-267`` with Conv2D's default use_bias=True) —
        # but ONLY when the channel count differs from ``filters``
        # (``:254``); then extend to P6/P7 by stride-2 max-pool
        # (``:210-218``; no conv since channels already == filters).
        pyramid = [
            f if f.shape[-1] == self.filters
            else ConvNormAct(filters=self.filters, kernel_size=1, act=None,
                             use_bias=True, name=f"resample_l{_MIN_LEVEL + i}",
                             **common)(f, train=train)
            for i, f in enumerate(feats_in)
        ]
        while len(pyramid) < _MAX_LEVEL - _MIN_LEVEL + 1:
            pyramid.append(
                nn.max_pool(pyramid[-1], (2, 2), strides=(2, 2),
                            padding="SAME"))

        num_levels = _MAX_LEVEL - _MIN_LEVEL + 1
        for rep in range(self.num_repeats):
            # one cell: reference ``_build_feature_pyramid`` (``:320-393``)
            feats = list(pyramid)
            feat_levels = list(range(_MIN_LEVEL, _MAX_LEVEL + 1))
            n_out_conn = [0] * len(feats)
            for i, (lvl, combine, (i0, i1), is_out) in enumerate(
                    self.block_specs):
                node0 = _resample_by_level(feats[i0], feat_levels[i0], lvl)
                node1 = _resample_by_level(feats[i1], feat_levels[i1], lvl)
                n_out_conn[i0] += 1
                n_out_conn[i1] += 1
                if self.use_sum_for_combination or combine == "sum":
                    new_node = node0 + node1.astype(node0.dtype)
                elif combine == "attention":
                    # coarser-or-equal node gates (``:351-355``; levels are
                    # the inputs' ORIGINAL pyramid levels)
                    if feat_levels[i0] >= feat_levels[i1]:
                        new_node = _global_attention(node0, node1)
                    else:
                        new_node = _global_attention(node1, node0)
                else:
                    raise ValueError(f"unknown combine_fn {combine!r}")
                if is_out:
                    # absorb unconsumed same-level intermediates
                    # (``:360-368``)
                    for j in range(len(feats)):
                        if n_out_conn[j] == 0 and feat_levels[j] == lvl:
                            n_out_conn[j] += 1
                            new_node = new_node + _resample_by_level(
                                feats[j], feat_levels[j], lvl
                            ).astype(new_node.dtype)
                new_node = nn.relu(new_node)
                new_node = ConvNormAct(
                    filters=self.filters, kernel_size=3, act=None,
                    use_bias=True, name=f"cell{rep}_sub{i}", **common,
                )(new_node, train=train)
                feats.append(new_node)
                feat_levels.append(lvl)
                n_out_conn.append(0)

            # new pyramid = the LAST num_levels nodes keyed by their level
            # (``:388-391``)
            by_level = {feat_levels[j]: feats[j]
                        for j in range(len(feats) - num_levels, len(feats))}
            pyramid = [by_level[lvl]
                       for lvl in range(_MIN_LEVEL, _MAX_LEVEL + 1)]

        if self.return_all_levels:
            return {lvl: f for lvl, f in
                    zip(range(_MIN_LEVEL, _MAX_LEVEL + 1), pyramid)}
        # finest level is the head feature (P3)
        return pyramid[0]
