"""Ring attention (parallel/ring.py) and Gemma sp_mode="ring".

The ring formulation must be numerically invisible: same outputs and
gradients as dense attention / the allgather-KV SP path, while the
compiled program rotates K/V blocks with collective-permute instead of
all-gathering the context.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iseg_tpu.nlp.gemma import GemmaCausalLM, get_preset
from iseg_tpu.parallel.ring import ring_attention


def _mesh(shape, names):
    n = int(np.prod(shape))
    return Mesh(np.asarray(jax.devices()[:n]).reshape(shape), names)


def _dense_ref(q, k, v, causal):
    t = q.shape[1]
    s = jnp.einsum("bthd,bshd->bhts", q, k)
    if causal:
        m = jnp.arange(t)[None, None, None, :] <= jnp.arange(t)[None, None, :, None]
        s = jnp.where(m, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    b, t, h, d = 2, 32, 4, 8
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.float32) * 0.5
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.float32) * 0.5
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    return q, k, v, pos


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_dense(qkv, causal):
    q, k, v, pos = qkv
    mesh = _mesh((2, 4), ("data", "model"))
    with jax.set_mesh(mesh):
        sh = NamedSharding(mesh, P("data", "model", None, None))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        ps = jax.device_put(pos, NamedSharding(mesh, P("data", "model")))
        got = jax.jit(
            lambda q, k, v, p: ring_attention(
                q, k, v, p, "model", batch_axis="data", causal=causal
            )
        )(qs, ks, vs, ps)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_dense_ref(q, k, v, causal)),
        rtol=1e-5, atol=1e-5,
    )


def test_ring_causal_masks_negative_position_padding(qkv):
    # padding K/V carry sentinel position -1; the causal branch must mask
    # them exactly like the non-causal branch does (-1 <= q_pos is true
    # for every query, so an unguarded causal test attends the padding)
    q, k, v, pos = qkv
    b, t = pos.shape
    pos_pad = pos.at[:, t // 2:].set(-1)  # second half = padding

    # dense reference: only the first half of K/V is real
    tq = q.shape[1]
    s = jnp.einsum("bthd,bshd->bhts", q, k)
    kv_ok = (np.asarray(pos_pad)[:, None, None, :] >= 0)
    causal_ok = (np.asarray(pos_pad)[:, None, None, :]
                 <= np.arange(tq)[None, None, :, None])
    s = jnp.where(jnp.asarray(kv_ok & causal_ok), s, -1e30)
    want = jnp.einsum("bhts,bshd->bthd", jax.nn.softmax(s, axis=-1), v)

    mesh = _mesh((2, 4), ("data", "model"))
    with jax.set_mesh(mesh):
        sh = NamedSharding(mesh, P("data", "model", None, None))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        qp = jax.device_put(pos, NamedSharding(mesh, P("data", "model")))
        kp = jax.device_put(pos_pad, NamedSharding(mesh, P("data", "model")))
        got = jax.jit(
            lambda q, k, v, qpos, kvpos: ring_attention(
                q, k, v, qpos, "model", batch_axis="data", causal=True,
                kv_positions=kvpos,
            )
        )(qs, ks, vs, qp, kp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ring_gqa_blocks_rotate_unrepeated(qkv):
    """GQA: kv heads < query heads — the ring takes the raw kvh-headed
    K/V (rotating the small blocks) and must match dense attention with
    the conventional pre-repeat."""
    q, _, _, pos = qkv
    rng = np.random.RandomState(3)
    b, t, h, d = q.shape
    kvh = h // 2
    k = jnp.asarray(rng.randn(b, t, kvh, d), jnp.float32) * 0.5
    v = jnp.asarray(rng.randn(b, t, kvh, d), jnp.float32)
    k_rep = jnp.repeat(k, 2, axis=2)
    v_rep = jnp.repeat(v, 2, axis=2)

    mesh = _mesh((2, 4), ("data", "model"))
    with jax.set_mesh(mesh):
        sh4 = NamedSharding(mesh, P("data", "model", None, None))
        qs = jax.device_put(q, sh4)
        ks = jax.device_put(k, sh4)
        vs = jax.device_put(v, sh4)
        ps = jax.device_put(pos, NamedSharding(mesh, P("data", "model")))
        got = jax.jit(
            lambda q, k, v, p: ring_attention(
                q, k, v, p, "model", batch_axis="data", causal=True
            )
        )(qs, ks, vs, ps)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_dense_ref(q, k_rep, v_rep, True)),
        rtol=1e-5, atol=1e-5,
    )


def test_ring_rejects_indivisible_seq(qkv):
    q, k, v, pos = qkv
    mesh = _mesh((1, 8), ("data", "model"))
    with jax.set_mesh(mesh):
        with pytest.raises(ValueError, match="not divisible"):
            ring_attention(q[:, :30], k[:, :30], v[:, :30], pos[:, :30],
                           "model")


def test_ring_grads_match_dense(qkv):
    q, k, v, pos = qkv
    mesh = _mesh((1, 8), ("data", "model"))
    with jax.set_mesh(mesh):
        sh = NamedSharding(mesh, P(None, "model", None, None))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        ps = jax.device_put(pos, NamedSharding(mesh, P(None, "model")))

        def loss_ring(args):
            q, k, v = args
            out = ring_attention(q, k, v, ps, "model", causal=True)
            return jnp.sum(out ** 2)

        g_ring = jax.jit(jax.grad(loss_ring))((qs, ks, vs))
    g_ref = jax.grad(
        lambda args: jnp.sum(_dense_ref(*args, True) ** 2)
    )((q, k, v))
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_ring_hlo_has_collective_permute(qkv):
    q, k, v, pos = qkv
    mesh = _mesh((1, 8), ("data", "model"))
    with jax.set_mesh(mesh):
        sh = NamedSharding(mesh, P(None, "model", None, None))
        qs = jax.device_put(q, sh)
        ps = jax.device_put(pos, NamedSharding(mesh, P(None, "model")))
        hlo = (
            jax.jit(
                lambda q, p: ring_attention(q, q, q, p, "model", causal=True)
            )
            .lower(qs, ps).compile().as_text()
        )
    assert "collective-permute" in hlo, "ring lost its ppermute rotation"


@pytest.fixture(scope="module")
def gemma_setup():
    cfg = get_preset("gemma_test")
    lm_ref = GemmaCausalLM(cfg)
    variables = lm_ref.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, (4, 16)), jnp.int32)
    return cfg, lm_ref, variables, ids


def test_gemma_ring_logits_match(gemma_setup):
    cfg, lm_ref, variables, ids = gemma_setup
    ref = lm_ref(variables, ids)
    mesh = _mesh((2, 4), ("data", "model"))
    lm_ring = GemmaCausalLM(cfg, seq_axis="model", data_axis="data",
                            sp_mode="ring")
    with jax.set_mesh(mesh):
        ids_s = jax.device_put(ids, NamedSharding(mesh, P("data", "model")))
        got = jax.jit(lambda v, i: lm_ring(v, i))(variables, ids_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_gemma_ring_loss_and_grads_match(gemma_setup):
    cfg, lm_ref, variables, ids = gemma_setup
    params = variables["params"]
    weights = jnp.asarray(
        (np.random.RandomState(1).rand(*ids.shape) > 0.2).astype(np.float32)
    )

    def loss_with(lm, params, ids):
        logits = lm({"params": params}, ids)
        targets = ids[:, 1:]
        w = weights[:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    l_ref, g_ref = jax.value_and_grad(
        lambda p: loss_with(lm_ref, p, ids)
    )(params)

    mesh = _mesh((2, 4), ("data", "model"))
    lm_ring = GemmaCausalLM(cfg, seq_axis="model", data_axis="data",
                            sp_mode="ring")
    with jax.set_mesh(mesh):
        ids_s = jax.device_put(ids, NamedSharding(mesh, P("data", "model")))
        l_sp, g_sp = jax.jit(
            jax.value_and_grad(lambda p: loss_with(lm_ring, p, ids_s))
        )(params)
        l_sp, g_sp = jax.device_get((l_sp, g_sp))

    np.testing.assert_allclose(l_sp, l_ref, rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        ),
        g_sp, g_ref,
    )


def test_gemma_ring_no_mesh_fallback(gemma_setup):
    """A ring-configured LM without a mesh in context must fall back to
    dense attention with the causal mask intact (init anywhere, run
    anywhere)."""
    cfg, lm_ref, variables, ids = gemma_setup
    lm_ring = GemmaCausalLM(cfg, seq_axis="model", data_axis="data",
                            sp_mode="ring")
    got = lm_ring(variables, ids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(lm_ref(variables, ids)),
        rtol=1e-5, atol=1e-5,
    )


def test_gemma_ring_generation_unaffected(gemma_setup):
    cfg, lm_ref, variables, ids = gemma_setup
    prompts = ids[:, :6]
    lengths = jnp.full((prompts.shape[0],), 6, jnp.int32)
    out_ref = lm_ref.generate(variables, prompts, lengths, max_length=10)
    lm_ring = GemmaCausalLM(cfg, seq_axis="model", data_axis="data",
                            sp_mode="ring")
    out_ring = lm_ring.generate(variables, prompts, lengths, max_length=10)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_ring))
