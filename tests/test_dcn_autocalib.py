"""DCN sampling auto-calibration on pretrained ingest (VERDICT r2 #5):
checkpoints with offsets beyond the default dense-local clamp must be
detected at load time and pinned to a safe per-block mode that bit-matches
the reference gather sampler (/root/reference/layers/dcn_v3/op.py:16-109)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.backbones.intern_image import InternImage
from iseg_tpu.backbones.pretrained import (
    auto_calibrate_dcn,
    load_pretrained_backbone,
    name_map_for,
)


def _tiny_model(**kwargs):
    return InternImage(
        channels=16, depths=(1, 1), groups=(2, 4), layer_scale=1.0,
        drop_path_rate=0.0, return_endpoints=False, **kwargs,
    )


@pytest.fixture(scope="module")
def doctored():
    """Auto-mode model whose stage0 block carries 'trained' offsets ~3 px —
    outside the default r=2 dense-local clamp."""
    model = _tiny_model(dcn_sampling="auto")
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = copy.deepcopy(jax.device_get(variables))
    bias = variables["params"]["stage0_block0"]["dcn"]["offset_head"]["bias"]
    variables["params"]["stage0_block0"]["dcn"]["offset_head"]["bias"] = (
        np.full_like(np.asarray(bias), 3.0)
    )
    return model, variables, x


def test_calibration_detects_large_offsets(doctored):
    model, variables, x = doctored
    calibrated, report = auto_calibrate_dcn(model, variables, x)
    assert any(k.startswith("stage0_block0") for k in report)
    rec = next(v for k, v in report.items() if k.startswith("stage0_block0"))
    assert rec["max_offset_mag"] > 2.0
    assert rec["recommended_r"] > 2
    # the rebuilt model pins the per-block mode
    assert calibrated.dcn_overrides is not None
    mode, r = calibrated.dcn_overrides["stage0_block0"]
    assert (mode == "gather") or (mode == "dense_local_ref" and r > 2)


def test_calibrated_model_matches_reference_gather(doctored):
    """Done-criterion: after auto-calibration the model's output equals the
    reference-exact gather sampler; the UNCALIBRATED r=2 clamp does not."""
    model, variables, x = doctored
    calibrated, _ = auto_calibrate_dcn(model, variables, x)
    reference = model.clone(dcn_sampling="gather", dcn_overrides=None)

    out_ref = np.asarray(reference.apply(variables, x, train=False))
    out_cal = np.asarray(calibrated.apply(variables, x, train=False))
    out_raw = np.asarray(model.apply(variables, x, train=False))

    np.testing.assert_allclose(out_cal, out_ref, rtol=1e-5, atol=1e-5)
    # the default clamp silently diverges on these offsets — the exact
    # failure mode calibration exists to prevent
    assert np.abs(out_raw - out_ref).max() > 1e-3


def test_calibration_tap_stays_out_of_intermediates():
    # HookPoint users mutate "intermediates"; the offset statistics live
    # in their own "dcn_calibration" collection so feature taps neither
    # pay for nor receive them
    import jax.numpy as jnp
    from iseg_tpu.nn.dcn import DCNv3

    m = DCNv3(filters=8, groups=2, sampling="gather")
    x = jnp.zeros((1, 8, 8, 8))
    variables = m.init(jax.random.PRNGKey(0), x)
    _, state = m.apply(variables, x, mutable=["intermediates"])
    assert "dcn_offset_mag" not in str(state.get("intermediates", {}))
    _, state = m.apply(variables, x, mutable=["dcn_calibration"])
    assert "dcn_offset_mag" in str(state.get("dcn_calibration", {}))


def test_invalid_sampling_mode_raises():
    import jax.numpy as jnp
    import pytest
    from iseg_tpu.nn.dcn import DCNv3

    m = DCNv3(filters=8, groups=2, sampling="dense-local")  # typo
    with pytest.raises(ValueError, match="unknown DCNv3 sampling"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)))


def test_dense_local_strided_falls_back_to_centered_gather():
    # stride=2 cannot take the dense-local machinery; the fallback must
    # stay in the CENTERED semantics family (== gather_centered), not the
    # reference-quirk sampler
    import jax.numpy as jnp
    import numpy as np
    from iseg_tpu.nn.dcn import DCNv3

    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 8), jnp.float32)
    out_dl = DCNv3(filters=8, groups=2, stride=2, sampling="dense_local")
    out_gc = DCNv3(filters=8, groups=2, stride=2, sampling="gather_centered")
    v = out_dl.init(jax.random.PRNGKey(0), x)
    a = out_dl.apply(v, x)
    b = out_gc.apply(v, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_small_offsets_keep_fast_path():
    """Freshly-initialized (zero-offset-head) models stay on the
    dense-local fast path with the default clamp."""
    model = _tiny_model(dcn_sampling="auto")
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    calibrated, report = auto_calibrate_dcn(model, variables, x)
    assert report
    for rec in report.values():
        assert rec["recommended_sampling"] == "dense_local_ref"
        assert rec["recommended_r"] <= 2
    out_a = np.asarray(model.apply(variables, x, train=False))
    out_b = np.asarray(calibrated.apply(variables, x, train=False))
    np.testing.assert_allclose(out_a, out_b, rtol=1e-5, atol=1e-6)


def test_name_map_resolution():
    from iseg_tpu.core import weight_maps

    assert name_map_for("resnet50") is weight_maps.keras_resnet_name_map
    assert name_map_for("intern_image_tiny") is weight_maps.intern_image_name_map
    assert name_map_for("mlp_mixer_b16") is weight_maps.mlp_mixer_name_map
    assert name_map_for("placeholder") is None


def test_load_pretrained_name_map_accepts_unwrapped_paths(tmp_path):
    """Explicit user name_map keys address the model's VISIBLE variable
    paths ('params/stem/...'); the internal 'backbone' wrapping must not
    leak into the user contract."""
    h5py = pytest.importorskip("h5py")
    from iseg_tpu.backbones import get_backbone

    bb = get_backbone("mobilenetv2", width_multiplier=0.35)
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # one visible path -> custom h5 name
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    vis_path = "/".join(str(getattr(p, "key", p)) for p in flat[0][0])
    shape = np.asarray(flat[0][1]).shape

    path = str(tmp_path / "w.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("my/custom/name", data=np.full(shape, 7.0, np.float32))

    _, loaded, report = load_pretrained_backbone(
        "mobilenetv2", path, input_size=(32, 32), strict=False,
        name_map={vis_path: "my/custom/name"}, calibrate_dcn=False,
        width_multiplier=0.35,
    )
    assert vis_path.split("/")[0] in ("params", "batch_stats")
    got = loaded
    for seg in vis_path.split("/"):
        got = got[seg]
    np.testing.assert_allclose(np.asarray(got), 7.0)


def test_load_pretrained_backbone_ingests_h5(tmp_path):
    """End-to-end: get_backbone-equivalent one-call path builds the model,
    ingests a keras-named h5, and reports what loaded."""
    h5py = pytest.importorskip("h5py")

    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.weight_maps import keras_resnet_name_map

    bb = get_backbone("resnet50")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    wrapped = {"params": {"backbone": variables["params"]},
               "batch_stats": {"backbone": variables["batch_stats"]}}
    mapping = keras_resnet_name_map(wrapped)

    flat = jax.tree_util.tree_flatten_with_path(wrapped)[0]
    by_path = {"/".join(str(getattr(p, "key", p)) for p in path): np.asarray(v)
               for path, v in flat}
    path = str(tmp_path / "resnet50.h5")
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        for flax_path, name in mapping.items():
            f.create_dataset(
                name, data=rng.rand(*by_path[flax_path].shape).astype(np.float32)
            )

    model, loaded, report = load_pretrained_backbone(
        "resnet50", path, input_size=(32, 32), strict=True
    )
    assert not report["weights"]["missing"]
    assert "dcn_calibration" not in report  # DCN-free family
    # a concrete loaded value survives the wrap/unwrap
    with h5py.File(path, "r") as f:
        some_path, some_name = next(iter(mapping.items()))
        stored = np.asarray(f[some_name])
    rel = some_path.split("/")[2:]  # drop {coll}/backbone
    node = loaded[some_path.split("/")[0]]
    for seg in rel:
        node = node[seg]
    np.testing.assert_allclose(np.asarray(node), stored, rtol=1e-6)
