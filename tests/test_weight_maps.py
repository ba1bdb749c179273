"""Keras-checkpoint name-map h5 round-trips: a synthetic .h5 file written
with exact reference weight names must load COMPLETELY into our backbones
through the file-based ingest path (tests/test_ref_name_maps.py covers
full-inventory coverage; this covers the h5py file plumbing + transforms)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from iseg_tpu.backbones import get_backbone
from iseg_tpu.core.h5_ingest import load_h5_weights_by_name
from iseg_tpu.core.weight_maps import (
    keras_mobilenetv2_name_map,
    keras_resnet_name_map,
)


def _spec_name(spec):
    if isinstance(spec, tuple):
        spec = spec[0]
    return spec if isinstance(spec, str) else spec[0]


def _inverse_transform(spec, arr):
    """Our only transform today is the depthwise HWCM<->HWMC transpose;
    invert it so the synthetic h5 carries the KERAS layout."""
    if isinstance(spec, tuple) and not isinstance(spec[0], tuple):
        return arr.transpose(0, 1, 3, 2)
    return arr


def _fake_keras_h5(tmp_path, mapping, variables):
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    by_path = {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(v)
        for path, v in flat
    }
    path = str(tmp_path / "keras.h5")
    with h5py.File(path, "w") as f:
        for flax_path, spec in mapping.items():
            name = _spec_name(spec)
            val = np.full(by_path[flax_path].shape,
                          (hash(name) % 1000) / 1000.0, np.float32)
            val = _inverse_transform(spec, val)
            f.create_dataset(name, data=val)
    return path, by_path


def _roundtrip(backbone_name, map_fn, **kwargs):
    bb = get_backbone(backbone_name, **kwargs)
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    wrapped = {"params": {"backbone": variables["params"]},
               "batch_stats": {"backbone": variables["batch_stats"]}}
    mapping = map_fn(wrapped)

    flat = jax.tree_util.tree_flatten_with_path(wrapped)[0]
    all_paths = {"/".join(str(getattr(p, "key", p)) for p in path)
                 for path, _ in flat}
    missing = all_paths - set(mapping)
    assert not missing, sorted(missing)[:8]
    return wrapped, mapping


def test_resnet50_keras_h5_roundtrip(tmp_path):
    wrapped, mapping = _roundtrip("resnet50", keras_resnet_name_map)

    assert mapping["params/backbone/stem0/conv/kernel"] == "conv1_1_conv/kernel"
    assert (mapping["params/backbone/stage0_block0/shortcut/norm/scale"]
            == "conv2_block1_0_bn/gamma")
    assert (mapping["batch_stats/backbone/stage3_block2/conv3/norm/var"]
            == "conv5_block3_3_bn/moving_variance")

    path, _ = _fake_keras_h5(tmp_path, mapping, wrapped)
    restored, report = load_h5_weights_by_name(wrapped, path, name_map=mapping)
    assert not report["missing"], report["missing"][:5]
    v = np.asarray(restored["params"]["backbone"]["stem0"]["conv"]["kernel"])
    assert np.allclose(v, (hash("conv1_1_conv/kernel") % 1000) / 1000.0)


def test_mobilenetv2_keras_h5_roundtrip(tmp_path):
    wrapped, mapping = _roundtrip("mobilenetv2", keras_mobilenetv2_name_map,
                                  include_top_conv=True)
    assert mapping["params/backbone/stem/conv/kernel"] == "Conv1/kernel"
    assert (mapping["params/backbone/block_1/expand/conv/kernel"]
            == "block_1_expand/kernel")
    spec = mapping["params/backbone/block_0/depthwise/conv/kernel"]
    assert spec[0] == "expanded_conv_depthwise/kernel"  # (name, transform)

    path, _ = _fake_keras_h5(tmp_path, mapping, wrapped)
    restored, report = load_h5_weights_by_name(wrapped, path, name_map=mapping)
    assert not report["missing"], report["missing"][:5]
