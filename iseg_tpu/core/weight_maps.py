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


_LEAF_TO_KERAS_LN = {"scale": "gamma", "bias": "beta"}


def _squeeze_grn(w):
    return w.reshape(-1)


def efficientnet_name_map(variables, backbone_prefix: str = "backbone") -> Mapping[str, object]:
    """Map iseg_tpu EfficientNet params to the reference's keras-applications
    naming (``backbones/efficientnet.py``: ``stem_conv/bn``,
    ``block{stage}{letter}_{expand_conv,expand_bn,dwconv,bn,se_reduce,
    se_expand,project_conv,project_bn}``, ``top_conv/bn``)."""
    mapping: dict[str, object] = {}
    for path in _paths(variables):
        segs = path.split("/")
        if backbone_prefix not in segs:
            continue
        rel = segs[segs.index(backbone_prefix) + 1:]
        leaf = rel[-1]

        def conv(name):
            return f"{name}/{_LEAF_TO_KERAS_CONV.get(leaf)}"

        def bn(name):
            return f"{name}/{_LEAF_TO_KERAS_BN.get(leaf)}"

        if rel[0] == "stem":
            mapping[path] = conv("stem_conv") if rel[1] == "conv" else bn("stem_bn")
        elif rel[0] == "top_conv":
            mapping[path] = conv("top_conv") if rel[1] == "conv" else bn("top_bn")
        elif rel[0].startswith("block_"):
            _, s, i = rel[0].split("_")
            tag = f"block{int(s) + 1}{chr(ord('a') + int(i))}"
            part = rel[1]
            if part == "expand":
                mapping[path] = (conv(f"{tag}_expand_conv") if rel[2] == "conv"
                                 else bn(f"{tag}_expand_bn"))
            elif part == "depthwise":
                if rel[2] == "conv":
                    mapping[path] = (f"{tag}_dwconv/kernel", depthwise_to_flax)
                else:
                    mapping[path] = bn(f"{tag}_bn")
            elif part == "se":
                sub = "se_reduce" if rel[2] == "reduce" else "se_expand"
                mapping[path] = conv(f"{tag}_{sub}")
            elif part == "project":
                mapping[path] = (conv(f"{tag}_project_conv") if rel[2] == "conv"
                                 else bn(f"{tag}_project_bn"))
    return mapping


def xception_name_map(variables, backbone_prefix: str = "backbone") -> Mapping[str, object]:
    """Map iseg_tpu Xception-65 params to the reference's DeepLab naming
    (``backbones/xception_common.py``: ``block1_conv{1,2}``, entry blocks
    2-4, middle 5-20, exit 21 + 22's separable convs; weight names
    ``block{N}_separable_conv{M}_{depthwise,pointwise}(_BN)`` and
    ``block{N}_shortcut(_BN)``)."""
    mapping: dict[str, object] = {}
    for path in _paths(variables):
        segs = path.split("/")
        if backbone_prefix not in segs:
            continue
        rel = segs[segs.index(backbone_prefix) + 1:]
        leaf = rel[-1]

        def block_num(mod):
            if mod.startswith("entry_block"):
                return int(mod[len("entry_block"):]) + 1
            if mod.startswith("middle_block"):
                return int(mod[len("middle_block"):]) + 5
            if mod == "exit_block":
                return 21
            if mod.startswith("exit_sepconv"):
                return 22
            return None

        mod = rel[0]
        if mod in ("stem0", "stem1"):
            base = "block1_conv1" if mod == "stem0" else "block1_conv2"
            if rel[1] == "conv":
                mapping[path] = f"{base}/{_LEAF_TO_KERAS_CONV.get(leaf)}"
            else:
                mapping[path] = f"{base}_BN/{_LEAF_TO_KERAS_BN.get(leaf)}"
            continue
        n = block_num(mod)
        if n is None:
            continue
        if mod.startswith("exit_sepconv"):
            m = int(mod[len("exit_sepconv"):]) + 1
            part, sub = rel[1], rel[1]
        else:
            sub = rel[1]
            m = int(sub[len("sepconv"):]) + 1 if sub.startswith("sepconv") else None
            part = rel[2] if len(rel) > 2 else None

        if mod.startswith("exit_sepconv"):
            sep = f"block22_separable_conv{m}"
            if rel[1] == "depthwise":
                mapping[path] = (f"{sep}_depthwise/kernel", depthwise_to_flax)
            elif rel[1] == "depthwise_norm":
                mapping[path] = f"{sep}_depthwise_BN/{_LEAF_TO_KERAS_BN.get(leaf)}"
            elif rel[1] == "pointwise":
                if rel[2] == "conv":
                    mapping[path] = f"{sep}_pointwise/kernel"
                else:
                    mapping[path] = f"{sep}_pointwise_BN/{_LEAF_TO_KERAS_BN.get(leaf)}"
            continue

        if sub == "shortcut":
            if rel[2] == "conv":
                mapping[path] = f"block{n}_shortcut/kernel"
            else:
                mapping[path] = f"block{n}_shortcut_BN/{_LEAF_TO_KERAS_BN.get(leaf)}"
        elif sub.startswith("sepconv"):
            sep = f"block{n}_separable_conv{m}"
            if part == "depthwise":
                mapping[path] = (f"{sep}_depthwise/kernel", depthwise_to_flax)
            elif part == "depthwise_norm":
                mapping[path] = f"{sep}_depthwise_BN/{_LEAF_TO_KERAS_BN.get(leaf)}"
            elif part == "pointwise":
                if rel[3] == "conv":
                    mapping[path] = f"{sep}_pointwise/kernel"
                else:
                    mapping[path] = f"{sep}_pointwise_BN/{_LEAF_TO_KERAS_BN.get(leaf)}"
    return mapping


def convnext_name_map(variables, backbone_prefix: str = "backbone") -> Mapping[str, object]:
    """Map iseg_tpu ConvNeXt/V2 params to the reference's naming
    (``backbones/convnext.py`` / ``convnext_v2.py``: ``downsample_layers.{k}``
    with stem at k=0, ``stages.{s}/{b}/{gamma,dwconv,norm,pwconv1,pwconv2,
    grn}``)."""
    mapping: dict[str, object] = {}
    for path in _paths(variables):
        segs = path.split("/")
        if backbone_prefix not in segs:
            continue
        rel = segs[segs.index(backbone_prefix) + 1:]
        leaf = rel[-1]
        ln = _LEAF_TO_KERAS_LN.get(leaf, leaf)

        if rel[0] == "stem_conv":
            mapping[path] = f"downsample_layers.0/0/{leaf}"
        elif rel[0] == "stem_norm":
            mapping[path] = f"downsample_layers.0/1/{ln}"
        elif rel[0].startswith("downsample_norm"):
            k = int(rel[0][len("downsample_norm"):])
            mapping[path] = f"downsample_layers.{k}/0/{ln}"
        elif rel[0].startswith("downsample_conv"):
            k = int(rel[0][len("downsample_conv"):])
            mapping[path] = f"downsample_layers.{k}/1/{leaf}"
        elif rel[0].startswith("stage"):
            s = int(rel[0][5:rel[0].index("_")])
            b = int(rel[0].split("block")[1])
            base = f"stages.{s}/{b}"
            if rel[1] == "gamma":  # layer scale
                mapping[path] = f"{base}/gamma"
            elif rel[1] == "dwconv":
                name = f"{base}/dwconv/{leaf}"
                mapping[path] = (name, depthwise_to_flax) if leaf == "kernel" else name
            elif rel[1] == "norm":
                mapping[path] = f"{base}/norm/{ln}"
            elif rel[1] in ("pwconv1", "pwconv2"):
                mapping[path] = f"{base}/{rel[1]}/{leaf}"
            elif rel[1] == "grn":
                # reference GRN params are [1,1,1,C]
                mapping[path] = (f"{base}/grn/{ln}", _squeeze_grn)
    return mapping


def swin_name_map(variables, backbone_prefix: str = "backbone") -> Mapping[str, object]:
    """Map iseg_tpu Swin params to the reference's Swin naming
    (``backbones/swin.py``: ``patch_embed/proj``, ``layers.{s}/blocks.{b}/
    {norm1,attn,norm2,mlp}``, ``layers.{s}/downsample``)."""
    mapping: dict[str, object] = {}
    for path in _paths(variables):
        segs = path.split("/")
        if backbone_prefix not in segs:
            continue
        rel = segs[segs.index(backbone_prefix) + 1:]
        leaf = rel[-1]
        ln = _LEAF_TO_KERAS_LN.get(leaf, leaf)

        if rel[0] == "patch_embed":
            mapping[path] = f"patch_embed/proj/{leaf}"
        elif rel[0] == "patch_norm":
            mapping[path] = f"patch_embed/norm/{ln}"
        elif rel[0].startswith("merge"):
            s = int(rel[0][5:]) - 1  # merge{k} follows stage k-1
            sub = rel[1]  # norm | reduction
            mapping[path] = (
                f"layers.{s}/downsample/norm/{ln}" if sub == "norm"
                else f"layers.{s}/downsample/reduction/{leaf}")
        elif rel[0].startswith("stage"):
            s = int(rel[0][5:rel[0].index("_")])
            b = int(rel[0].split("block")[1])
            base = f"layers.{s}/blocks.{b}"
            part = rel[1]
            if part in ("norm1", "norm2"):
                mapping[path] = f"{base}/{part}/{ln}"
            elif part == "attn":
                sub = rel[2]
                if sub == "relative_position_bias_table":
                    mapping[path] = f"{base}/attn/relative_position_bias_table"
                else:  # qkv | proj
                    mapping[path] = f"{base}/attn/{sub}/{leaf}"
            elif part in ("mlp_fc1", "mlp_fc2"):
                mapping[path] = f"{base}/mlp/fc{part[-1]}/{leaf}"
    return mapping
