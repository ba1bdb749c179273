"""Keras-checkpoint name-map coverage: a synthetic h5 written with exact
keras.applications names must load COMPLETELY into our backbones."""

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


def _fake_keras_h5(tmp_path, mapping, variables):
    """Write an h5 whose datasets carry the KERAS names with our shapes and
    deterministic values derived from the name."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    by_path = {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(v)
        for path, v in flat
    }
    path = str(tmp_path / "keras.h5")
    with h5py.File(path, "w") as f:
        for flax_path, keras_name in mapping.items():
            val = np.full(by_path[flax_path].shape,
                          (hash(keras_name) % 1000) / 1000.0, np.float32)
            f.create_dataset(keras_name, data=val)
    return path, by_path


def test_resnet50_keras_map_full_coverage(tmp_path):
    bb = get_backbone("resnet50")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    wrapped = {"params": {"backbone": variables["params"]},
               "batch_stats": {"backbone": variables["batch_stats"]}}
    mapping = keras_resnet_name_map(wrapped)

    # every backbone param is covered by the map
    flat = jax.tree_util.tree_flatten_with_path(wrapped)[0]
    all_paths = {"/".join(str(getattr(p, "key", p)) for p in path)
                 for path, _ in flat}
    missing = all_paths - set(mapping)
    assert not missing, sorted(missing)[:5]

    # keras names look right
    assert mapping["params/backbone/stem/conv/kernel"] == "conv1_conv/kernel"
    assert (mapping["params/backbone/stage0_block0/shortcut/norm/scale"]
            == "conv2_block1_0_bn/gamma")
    assert (mapping["batch_stats/backbone/stage3_block2/conv3/norm/var"]
            == "conv5_block3_3_bn/moving_variance")

    # round-trip through an h5 with keras names
    path, by_path = _fake_keras_h5(tmp_path, mapping, wrapped)
    restored, report = load_h5_weights_by_name(wrapped, path, name_map=mapping)
    assert not report["missing"], report["missing"][:5]
    # a spot value actually changed to the h5 content
    v = np.asarray(
        restored["params"]["backbone"]["stem"]["conv"]["kernel"])
    assert np.allclose(v, (hash("conv1_conv/kernel") % 1000) / 1000.0)


def test_mobilenetv2_keras_map_full_coverage(tmp_path):
    bb = get_backbone("mobilenetv2", include_top_conv=True)
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    wrapped = {"params": {"backbone": variables["params"]},
               "batch_stats": {"backbone": variables["batch_stats"]}}
    mapping = keras_mobilenetv2_name_map(wrapped)

    flat = jax.tree_util.tree_flatten_with_path(wrapped)[0]
    all_paths = {"/".join(str(getattr(p, "key", p)) for p in path)
                 for path, _ in flat}
    missing = all_paths - set(mapping)
    assert not missing, sorted(missing)[:8]

    assert mapping["params/backbone/stem/conv/kernel"] == "Conv1/kernel"
    assert (mapping["params/backbone/block_1/expand/conv/kernel"]
            == "block_1_expand/kernel")
    assert (mapping["params/backbone/block_0/depthwise/conv/kernel"]
            == "expanded_conv_depthwise/kernel")

    path, _ = _fake_keras_h5(tmp_path, mapping, wrapped)
    restored, report = load_h5_weights_by_name(wrapped, path, name_map=mapping)
    assert not report["missing"], report["missing"][:5]
