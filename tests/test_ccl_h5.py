"""Tests for connected-components labeling and H5 weight ingest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.ops.ccl import label_components, relabel_sequential


def test_ccl_two_components():
    mask = jnp.asarray(np.array([
        [1, 1, 0, 0],
        [1, 0, 0, 1],
        [0, 0, 1, 1],
        [0, 0, 1, 0],
    ], bool))
    labels = relabel_sequential(np.asarray(jax.jit(label_components)(mask)))
    assert labels.max() == 2
    assert labels[0, 0] == labels[1, 0]  # same component
    assert labels[1, 3] == labels[2, 2]  # connected through (2,3)
    assert labels[0, 0] != labels[2, 2]
    assert (labels[mask.__array__() == False] == 0).all() if False else True
    assert (labels[~np.asarray(mask)] == 0).all()


def test_ccl_diagonal_connectivity():
    mask = jnp.asarray(np.array([
        [1, 0],
        [0, 1],
    ], bool))
    lab4 = relabel_sequential(np.asarray(label_components(mask, connectivity=4)))
    lab8 = relabel_sequential(np.asarray(label_components(mask, connectivity=8)))
    assert lab4.max() == 2  # diagonal not connected at 4-connectivity
    assert lab8.max() == 1


def test_ccl_batched_and_empty():
    masks = jnp.zeros((2, 4, 4), bool).at[0, 1:3, 1:3].set(True)
    labels = np.asarray(label_components(masks))
    assert labels.shape == (2, 4, 4)
    assert labels[1].max() == 0  # empty mask
    assert len(np.unique(labels[0])) == 2  # background + one component


def test_ccl_snake():
    # a winding component exercises propagation depth
    mask = np.zeros((8, 8), bool)
    mask[0, :] = True
    mask[:, 7] = True
    mask[7, :] = True
    labels = relabel_sequential(np.asarray(label_components(jnp.asarray(mask))))
    assert labels.max() == 1


def test_h5_roundtrip_and_by_name(tmp_path):
    h5py = pytest.importorskip("h5py")
    from iseg_tpu.core.h5_ingest import (
        load_h5_weights_by_name,
        read_h5_weights,
        save_h5_weights,
    )

    variables = {
        "params": {
            "stem": {"conv": {"kernel": jnp.ones((3, 3, 3, 8))},
                     "norm": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}},
        },
        "batch_stats": {
            "stem": {"norm": {"mean": jnp.zeros((8,)), "var": jnp.ones((8,))}},
        },
    }
    path = str(tmp_path / "w.h5")
    save_h5_weights(variables, path)
    flat = read_h5_weights(path)
    assert "params/stem/conv/kernel" in flat

    # zero-out template, reload by name
    template = jax.tree_util.tree_map(jnp.zeros_like, variables)
    restored, report = load_h5_weights_by_name(template, path)
    assert not report["missing"]
    np.testing.assert_allclose(
        np.asarray(restored["params"]["stem"]["conv"]["kernel"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(restored["batch_stats"]["stem"]["norm"]["var"]), 1.0)


def test_keras_archive_path_dispatches(tmp_path):
    # load_h5_weights_by_name with a .keras STRING path must go through
    # the format dispatch (it used to call the h5 reader directly and die
    # on the zip signature)
    import zipfile

    pytest.importorskip("h5py")
    from iseg_tpu.core.h5_ingest import (
        load_h5_weights_by_name,
        save_h5_weights,
    )

    variables = {"params": {"stem": {"conv": {"kernel": jnp.ones((3, 3, 3, 4))}}}}
    inner = str(tmp_path / "model.weights.h5")
    save_h5_weights(variables, inner)
    archive = str(tmp_path / "m.keras")
    with zipfile.ZipFile(archive, "w") as z:
        z.write(inner, "model.weights.h5")

    template = jax.tree_util.tree_map(jnp.zeros_like, variables)
    restored, report = load_h5_weights_by_name(template, archive)
    assert not report["missing"]
    np.testing.assert_allclose(
        np.asarray(restored["params"]["stem"]["conv"]["kernel"]), 1.0)


def test_heuristic_rejects_positive_score_ties(tmp_path):
    # two same-shape weights sharing all matching tokens must NOT be
    # assigned by dict order — ambiguity goes to 'missing'
    pytest.importorskip("h5py")
    from iseg_tpu.core.h5_ingest import load_h5_weights_by_name

    weights = {
        "block1/bn1/gamma": np.full((4,), 1.0, np.float32),
        "block1/bn2/gamma": np.full((4,), 2.0, np.float32),
    }
    template = {"params": {"block1": {"bn": {"scale": jnp.zeros((4,))}}}}
    restored, report = load_h5_weights_by_name(template, weights)
    assert report["missing"]  # ambiguous, not silently assigned
    np.testing.assert_allclose(
        np.asarray(restored["params"]["block1"]["bn"]["scale"]), 0.0)


def test_h5_keras_style_names(tmp_path):
    """Keras-2-style file: layer/layer/weight:0 names, gamma/moving_mean
    vocabulary -> mapped onto flax scale/mean."""
    h5py = pytest.importorskip("h5py")
    import h5py as h5

    from iseg_tpu.core.h5_ingest import load_h5_weights_by_name

    path = str(tmp_path / "keras.h5")
    with h5.File(path, "w") as f:
        g = f.create_group("conv1")
        g.create_dataset("conv1/kernel:0", data=np.full((3, 3, 3, 4), 2.0, np.float32))
        b = f.create_group("bn1")
        b.create_dataset("bn1/gamma:0", data=np.full((4,), 3.0, np.float32))
        b.create_dataset("bn1/moving_mean:0", data=np.full((4,), 4.0, np.float32))

    variables = {
        "params": {"conv1": {"kernel": jnp.zeros((3, 3, 3, 4))},
                   "bn1": {"scale": jnp.zeros((4,))}},
        "batch_stats": {"bn1": {"mean": jnp.zeros((4,))}},
    }
    restored, report = load_h5_weights_by_name(variables, path)
    assert not report["missing"], report
    np.testing.assert_allclose(np.asarray(restored["params"]["conv1"]["kernel"]), 2.0)
    np.testing.assert_allclose(np.asarray(restored["params"]["bn1"]["scale"]), 3.0)
    np.testing.assert_allclose(np.asarray(restored["batch_stats"]["bn1"]["mean"]), 4.0)


def test_h5_shape_mismatch_reported(tmp_path):
    h5py = pytest.importorskip("h5py")
    from iseg_tpu.core.h5_ingest import load_h5_weights_by_name, save_h5_weights

    src = {"params": {"fc": {"kernel": jnp.ones((4, 4))}}}
    path = str(tmp_path / "w.h5")
    save_h5_weights(src, path)

    template = {"params": {"fc": {"kernel": jnp.zeros((8, 8))}}}
    restored, report = load_h5_weights_by_name(template, path)
    assert report["missing"] == ["params/fc/kernel"]
    with pytest.raises(ValueError):
        load_h5_weights_by_name(template, path, strict=True)
