"""Explicit weight-name maps: published Keras checkpoints -> iseg_tpu params.

The reference loads its published backbone weights by Keras layer name
(``saver/h5_saver.py:38``, dispatch ``backbones/feature_extractor.py:166-187``).
Drop-in compatibility therefore needs exact name tables per family; the
heuristic matcher in ``h5_ingest`` covers same-vocabulary files, these maps
cover the Keras-applications naming schemes.

Each map function takes the model's ``variables`` pytree and returns
{flax_path: h5_name} for ``load_h5_weights_by_name(..., name_map=...)``.
"""

from __future__ import annotations

from typing import Mapping

import jax

_LEAF_TO_KERAS_CONV = {"kernel": "kernel", "bias": "bias"}
_LEAF_TO_KERAS_BN = {
    "scale": "gamma",
    "bias": "beta",
    "mean": "moving_mean",
    "var": "moving_variance",
}


def depthwise_to_flax(w):
    """Keras depthwise kernel [H, W, C, mult] -> flax grouped-conv kernel
    [H, W, mult, C]."""
    return w.transpose(0, 1, 3, 2)


def _paths(variables) -> list[str]:
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = []
    for path, _ in flat:
        out.append("/".join(str(getattr(p, "key", p)) for p in path))
    return out


def keras_resnet_name_map(variables, backbone_prefix: str = "backbone") -> Mapping[str, str]:
    """Map iseg_tpu ResNet params to keras.applications ResNet50/101/152
    names (``conv1_conv``, ``conv{s}_block{b}_{i}_conv`` / ``_bn``,
    shortcut = ``_0_conv``/``_0_bn``)."""
    mapping: dict[str, str] = {}
    for path in _paths(variables):
        segs = path.split("/")
        if backbone_prefix not in segs:
            continue
        i = segs.index(backbone_prefix)
        rel = segs[i + 1 :]
        leaf = rel[-1]

        if rel[0] == "stem":
            # stem/conv/kernel or stem/norm/{scale,...}
            if rel[1] == "conv":
                name = f"conv1_conv/{_LEAF_TO_KERAS_CONV.get(leaf)}"
            else:
                name = f"conv1_bn/{_LEAF_TO_KERAS_BN.get(leaf)}"
            mapping[path] = name
            continue

        if rel[0].startswith("stem"):
            # deep stem: stem{i} -> conv1_{i+1}_conv / conv1_{i+1}_bn
            # (reference build_3x3_resnet, resnet_common.py:246-276)
            i_stem = int(rel[0][4:]) + 1
            if rel[1] == "conv":
                name = f"conv1_{i_stem}_conv/{_LEAF_TO_KERAS_CONV.get(leaf)}"
            else:
                name = f"conv1_{i_stem}_bn/{_LEAF_TO_KERAS_BN.get(leaf)}"
            mapping[path] = name
            continue

        if rel[0].startswith("stage"):
            # stage{s}_block{b}/{conv1|conv2|conv3|shortcut}/{conv|norm}/leaf
            stage_block = rel[0]
            s = int(stage_block[5 : stage_block.index("_")])
            b = int(stage_block.split("block")[1])
            part = rel[1]
            kind = rel[2]  # conv | norm
            idx = {"conv1": "1", "conv2": "2", "conv3": "3", "shortcut": "0"}.get(part)
            if idx is None:
                continue
            base = f"conv{s + 2}_block{b + 1}_{idx}"
            if kind == "conv":
                name = f"{base}_conv/{_LEAF_TO_KERAS_CONV.get(leaf)}"
            else:
                name = f"{base}_bn/{_LEAF_TO_KERAS_BN.get(leaf)}"
            mapping[path] = name
    return mapping


def keras_mobilenetv2_name_map(variables, backbone_prefix: str = "backbone") -> Mapping[str, str]:
    """Map iseg_tpu MobileNetV2 params to keras.applications MobileNetV2
    names (``Conv1``, ``expanded_conv_*``, ``block_{n}_{expand|depthwise|
    project}`` + ``_BN``)."""
    mapping: dict[str, str] = {}
    for path in _paths(variables):
        segs = path.split("/")
        if backbone_prefix not in segs:
            continue
        i = segs.index(backbone_prefix)
        rel = segs[i + 1 :]
        leaf = rel[-1]

        def conv_or_bn(base_conv, base_bn, kind, depthwise=False):
            if kind == "conv":
                name = f"{base_conv}/{_LEAF_TO_KERAS_CONV.get(leaf)}"
                if depthwise and leaf == "kernel":
                    return (name, depthwise_to_flax)
                return name
            return f"{base_bn}/{_LEAF_TO_KERAS_BN.get(leaf)}"

        if rel[0] == "stem":
            mapping[path] = conv_or_bn("Conv1", "bn_Conv1", rel[1])
            continue
        if rel[0].startswith("block_"):
            n = int(rel[0].split("_")[1])
            part = rel[1]  # expand | depthwise | project
            kind = rel[2]
            if n == 0:
                # keras block 0 is "expanded_conv_*" with no expand stage
                base = {"depthwise": ("expanded_conv_depthwise",
                                      "expanded_conv_depthwise_BN"),
                        "project": ("expanded_conv_project",
                                    "expanded_conv_project_BN")}.get(part)
            else:
                base = {"expand": (f"block_{n}_expand", f"block_{n}_expand_BN"),
                        "depthwise": (f"block_{n}_depthwise",
                                      f"block_{n}_depthwise_BN"),
                        "project": (f"block_{n}_project",
                                    f"block_{n}_project_BN")}.get(part)
            if base is None:
                continue
            mapping[path] = conv_or_bn(base[0], base[1], kind,
                                       depthwise=(part == "depthwise"))
            continue
        if rel[0] == "top_conv":
            mapping[path] = conv_or_bn("Conv_1", "Conv_1_bn", rel[1])
    return mapping
