"""End-to-end test of the fused upsample+CE path inside SegManaged."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones import get_backbone
from iseg_tpu.core.model import SegManaged
from iseg_tpu.nn.heads import SimpleDecoder


def _models():
    kwargs = dict(
        num_class=4,
        backbone=get_backbone("mobilenetv2", output_stride=16, width_multiplier=0.35),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    fused = SegManaged(upsample_logits=False, fuse_upsample_loss=True, **kwargs)
    plain = SegManaged(**kwargs)
    return fused, plain


def test_fused_loss_matches_plain_path():
    fused, plain = _models()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 4, (2, 32, 32)), jnp.int32)

    variables = fused.init(jax.random.PRNGKey(0), x)

    out_fused = fused.apply(variables, x)
    assert out_fused.shape[1] < 32  # logits stay at output stride

    loss_fused, _ = fused.build_loss_fn()(out_fused, labels)

    out_plain = plain.apply(variables, x)  # same params, upsampled logits
    loss_plain, _ = plain.build_loss_fn()(out_plain, labels)

    np.testing.assert_allclose(float(loss_fused), float(loss_plain), rtol=1e-4)


def test_fused_loss_gradients_match():
    fused, plain = _models()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 4, (1, 32, 32)), jnp.int32)
    variables = fused.init(jax.random.PRNGKey(0), x)

    def loss_of(model):
        def f(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]}, x)
            return model.build_loss_fn()(out, labels)[0]
        return f

    g_fused = jax.grad(loss_of(fused))(variables["params"])
    g_plain = jax.grad(loss_of(plain))(variables["params"])
    fa = jax.tree_util.tree_leaves(g_fused)
    pa = jax.tree_util.tree_leaves(g_plain)
    for a, b in zip(fa, pa):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_fused_gate_defers_to_configured_reduction():
    """fuse_upsample_loss must NOT override a non-default loss reduction:
    the fused kernel only computes a valid-pixel mean, so global_batch
    configs take the unfused path (same gradient scale as configured)."""
    kwargs = dict(
        num_class=4,
        backbone=get_backbone("mobilenetv2", output_stride=16,
                              width_multiplier=0.35),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    gb = SegManaged(upsample_logits=False, fuse_upsample_loss=True,
                    loss_reduction="global_batch",
                    loss_global_batch_size=2, **kwargs)
    ref = SegManaged(loss_reduction="global_batch",
                     loss_global_batch_size=2, **kwargs)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randint(0, 4, (2, 32, 32)))
    y = y.at[0, :8].set(255)  # ignore coverage changes the scale if wrong

    vs = gb.init(jax.random.PRNGKey(0), x)
    out_gb = gb.apply(vs, x, train=False)
    out_ref = ref.apply(vs, x, train=False)
    loss_gb, _ = gb.build_loss_fn()(out_gb, y)
    # upsample the low-res logits like the plain model does internally
    loss_ref, _ = ref.build_loss_fn()(out_ref, y)
    np.testing.assert_allclose(float(loss_gb), float(loss_ref), rtol=1e-5)
