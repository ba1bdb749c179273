"""Serving export: jax.export artifact round trip (iseg_tpu.core.export).

The artifact must reproduce the live model's outputs exactly, run without
model code or weights, and serve any batch size via the symbolic batch dim.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.backbones import get_backbone
from iseg_tpu.core.export import export_inference, load_exported
from iseg_tpu.core.model import SegManaged
from iseg_tpu.nn.heads import SimpleDecoder


@pytest.fixture(scope="module")
def small_model():
    model = SegManaged(
        num_class=4,
        backbone=get_backbone("resnet9", output_stride=32),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return model, variables


def _imgs(rs, b, hw=32):
    return jnp.asarray(rs.rand(b, hw, hw, 3), jnp.float32)


def test_export_roundtrip_matches_live_model(small_model, tmp_path):
    model, variables = small_model
    path = str(tmp_path / "model.jaxexport")
    blob = export_inference(model, variables, (32, 32), path=path)
    assert isinstance(blob, bytes) and len(blob) > 0

    serve = load_exported(path)  # from disk, no model code
    x = _imgs(np.random.RandomState(0), 2)
    got = np.asarray(serve(x))
    out = model.apply(variables, x, train=False)
    want = np.asarray(out[0] if isinstance(out, (list, tuple)) else out,
                      np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_batch_polymorphic(small_model):
    model, variables = small_model
    serve = load_exported(export_inference(model, variables, (32, 32)))
    rs = np.random.RandomState(1)
    for b in (1, 3, 5):
        assert serve(_imgs(rs, b)).shape[0] == b


def test_export_label_output(small_model):
    model, variables = small_model
    serve = load_exported(
        export_inference(model, variables, (32, 32), output="label"))
    y = serve(_imgs(np.random.RandomState(2), 2))
    assert y.dtype == jnp.int32
    assert y.shape == (2, 32, 32)
    assert int(jnp.max(y)) < 4


def test_export_probs_output(small_model):
    model, variables = small_model
    serve = load_exported(
        export_inference(model, variables, (32, 32), output="probs"))
    p = np.asarray(serve(_imgs(np.random.RandomState(3), 1)))
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)


def test_export_multi_scale_flip(small_model):
    from iseg_tpu.core.export import _main_output
    from iseg_tpu.core.inference import inference_with_multi_scales

    model, variables = small_model
    serve = load_exported(export_inference(
        model, variables, (32, 32), scale_rates=(0.5, 1.0), flip=True,
        batch_polymorphic=False))
    x = _imgs(np.random.RandomState(4), 1)
    want = inference_with_multi_scales(
        lambda img: _main_output(model.apply(variables, img, train=False)),
        x, scale_rates=(0.5, 1.0), flip=True)
    np.testing.assert_allclose(np.asarray(serve(x)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_export_sliding_window(small_model):
    from iseg_tpu.core.export import _main_output
    from iseg_tpu.core.inference import inference_fn

    model, variables = small_model
    serve = load_exported(export_inference(
        model, variables, (48, 48), sliding_window_crop_size=(32, 32),
        batch_polymorphic=False))
    x = jnp.asarray(np.random.RandomState(5).rand(1, 48, 48, 3), jnp.float32)
    want = inference_fn(
        lambda img: _main_output(model.apply(variables, img, train=False)),
        x, sliding_window_crop_size=(32, 32))
    np.testing.assert_allclose(np.asarray(serve(x)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_export_int8_weights(small_model):
    model, variables = small_model
    blob_full = export_inference(model, variables, (32, 32))
    blob_int8 = export_inference(model, variables, (32, 32),
                                 int8_weights=True)
    # int8 baking shrinks the artifact substantially
    assert len(blob_int8) < 0.75 * len(blob_full)

    serve_full = load_exported(blob_full)
    serve_int8 = load_exported(blob_int8)
    x = _imgs(np.random.RandomState(6), 2)
    a = np.asarray(serve_full(x), np.float32)
    b = np.asarray(serve_int8(x), np.float32)
    # weight-only int8 keeps logits close
    assert np.abs(a - b).max() < 0.15 * max(1.0, np.abs(a).max())
