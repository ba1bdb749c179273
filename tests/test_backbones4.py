"""Tests for InternImage, MOAT, EVA02 backbones (the DCNv3/attention tier)."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones import get_backbone, list_backbones


def test_zoo_covers_reference_families():
    names = list_backbones()
    # one representative per reference backbone family (SURVEY.md §2.3)
    for family in ("resnet50", "xception65", "mobilenetv2", "efficientnetb0",
                   "hrnet_w48", "swin_tiny", "vit_base_patch16",
                   "convnext_tiny", "convnext_v2_tiny", "moat0",
                   "intern_image_tiny", "eva02_tiny", "mlp_mixer_b16",
                   "placeholder"):
        assert family in names, f"{family} missing from registry"


def test_intern_image_tiny():
    bb = get_backbone("intern_image_tiny")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    eps = bb.apply(variables, jnp.zeros((1, 64, 64, 3)))
    # reference intern_image.py:126-130: os2 stem tap + 4 stage endpoints
    assert [e.shape[1] for e in eps] == [32, 16, 8, 4, 2]
    assert [e.shape[-1] for e in eps] == [32, 64, 128, 256, 512]
    assert np.isfinite(np.asarray(eps[-1])).all()


def test_moat0():
    bb = get_backbone("moat0")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    eps = bb.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert [e.shape[1] for e in eps] == [32, 16, 8, 4, 2]
    assert eps[-1].shape[-1] == 768
    assert np.isfinite(np.asarray(eps[-1])).all()


def test_eva02_tiny_and_rope():
    bb = get_backbone("eva02_tiny")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
    eps = bb.apply(variables, jnp.zeros((1, 56, 56, 3)))
    # reference endpoint semantics (eva.py:301-313):
    # [class_token, patch_embedding, *per-block]
    assert len(eps) == 2 + bb.depth
    assert eps[0].shape == (1, 1, 192)      # class token
    assert eps[1].shape == (1, 4, 4, 192)   # patch embedding
    assert eps[-1].shape == (1, 4, 4, 192)  # last block
    # input-size freedom: same params, new grid -> new rope table
    eps2 = bb.apply(variables, jnp.zeros((1, 70, 70, 3)))
    assert eps2[-1].shape == (1, 5, 5, 192)


def test_eva02_patch_dropout_trains():
    bb = get_backbone("eva02_tiny", patch_dropout_rate=0.5,
                      return_endpoints=False)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 56, 56, 3), jnp.float32)
    variables = bb.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)

    def loss_fn(params):
        out = bb.apply({"params": params}, x, train=True,
                       rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.mean(out ** 2)

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    leaf = jax.tree_util.tree_leaves(grads)[0]
    assert np.isfinite(np.asarray(leaf)).all()
    # eval-mode output keeps full spatial grid and drops nothing
    out_eval = bb.apply({"params": variables["params"]}, x, train=False)
    assert out_eval.shape == (2, 4, 4, 192)


def test_rope_preserves_norm():
    from iseg_tpu.backbones.eva import apply_rope, build_rope_2d

    sin, cos = build_rope_2d(4, 4, 32)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 2, 32), jnp.float32)
    y = apply_rope(x, jnp.asarray(sin), jnp.asarray(cos))
    # rotations preserve the L2 norm of each (pair) vector
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1),
        rtol=1e-5,
    )


def test_rope_translation_dependence():
    from iseg_tpu.backbones.eva import apply_rope, build_rope_2d

    sin, cos = build_rope_2d(2, 2, 8)
    x = jnp.ones((1, 4, 1, 8))
    y = np.asarray(apply_rope(x, jnp.asarray(sin), jnp.asarray(cos)))
    # position (0,0) gets zero rotation; others rotate
    np.testing.assert_allclose(y[0, 0, 0], 1.0, rtol=1e-6)
    assert not np.allclose(y[0, 3, 0], 1.0)


def test_swiglu():
    from iseg_tpu.backbones.eva import SwiGLU

    layer = SwiGLU(hidden_dim=16, out_dim=8)
    x = jnp.ones((2, 4, 8))
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == (2, 4, 8)
