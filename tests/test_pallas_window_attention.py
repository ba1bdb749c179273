"""Pallas window-attention kernel vs the XLA reference: forward values and
all gradients (q/k/v/bias), masked (shifted) and unmasked, interpret mode.
Real-TPU Mosaic lowering is verified by tools/probe_swin_attention.py and
the Swin benches (interpret passing does not guarantee lowering — verify
skill note)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.ops.pallas.window_attention import (
    window_attention,
    window_attention_reference,
)

N, D = 49, 32


def _inputs(bnw=6, h=3, nw=1, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(bnw, h, N, D), jnp.float32)
    k = jnp.asarray(rng.randn(bnw, h, N, D), jnp.float32)
    v = jnp.asarray(rng.randn(bnw, h, N, D), jnp.float32)
    bias = jnp.asarray(rng.randn(h, N, N) * 0.1, jnp.float32)
    if nw == 1:
        mask = jnp.zeros((1, N, N), jnp.float32)
    else:
        mask = jnp.asarray(
            np.where(rng.rand(nw, N, N) > 0.7, -100.0, 0.0), jnp.float32)
    return q, k, v, bias, mask


@pytest.mark.parametrize("nw", [1, 3])
def test_forward_matches_reference(nw):
    q, k, v, bias, mask = _inputs(bnw=6, h=3, nw=nw)
    scale = 1.0 / np.sqrt(D)
    out = window_attention(q, k, v, bias, mask, scale, True)
    ref = window_attention_reference(q, k, v, bias, mask, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("nw", [1, 3])
def test_gradients_match_reference(nw):
    q, k, v, bias, mask = _inputs(bnw=6, h=2, nw=nw, seed=1)
    scale = 1.0 / np.sqrt(D)

    def loss_pallas(q, k, v, bias):
        out = window_attention(q, k, v, bias, mask, scale, True)
        return jnp.sum(out * out)

    def loss_ref(q, k, v, bias):
        out = window_attention_reference(q, k, v, bias, mask, scale)
        return jnp.sum(out * out)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g_p, g_r, "q k v bias".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=f"grad mismatch: {name}")


def test_bf16_inputs():
    q, k, v, bias, mask = _inputs(bnw=4, h=2)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = window_attention(q, k, v, bias, mask, 1.0 / np.sqrt(D), True)
    ref = window_attention_reference(q, k, v, bias, mask, 1.0 / np.sqrt(D))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_mask_selected_per_window():
    """Window i gets mask i % nW — masked columns' probabilities vanish."""
    bnw, h, nw = 4, 1, 2
    q, k, v, bias, _ = _inputs(bnw=bnw, h=h)
    # mask 0 blocks nothing; mask 1 blocks all but the first key
    mask = jnp.stack([
        jnp.zeros((N, N)),
        jnp.broadcast_to(
            jnp.where(jnp.arange(N)[None, :] > 0, -1e9, 0.0), (N, N)),
    ]).astype(jnp.float32)
    out = window_attention(q, k, v, bias, mask, 1.0, True)
    # windows 1 and 3 attend only to key 0 -> output rows equal v[:, :, 0]
    for w in (1, 3):
        np.testing.assert_allclose(
            np.asarray(out[w, 0]),
            np.broadcast_to(np.asarray(v[w, 0, 0]), (N, D)),
            rtol=1e-4, atol=1e-4)
