"""Pipeline parallelism (parallel/pipeline.py + nlp/gemma/pipeline.py).

The GPipe schedule must be numerically invisible: forward and gradients
bit-close to running the same stages serially on one device, with the
collective-permute visible in the compiled HLO.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from iseg_tpu.parallel.pipeline import (
    pipeline_spmd,
    stack_params,
    unstack_params,
)


def _mesh(shape, names):
    n = int(np.prod(shape))
    return Mesh(np.asarray(jax.devices()[:n]).reshape(shape), names)


def _stage_fn(p, x):
    return x + jnp.tanh(x @ p["w"] + p["b"])


def _make_params(rng, n_stages, dim):
    return [
        {
            "w": jnp.asarray(rng.randn(dim, dim) * 0.1, jnp.float32),
            "b": jnp.asarray(rng.randn(dim) * 0.1, jnp.float32),
        }
        for _ in range(n_stages)
    ]


@pytest.mark.parametrize("n_stages,microbatches", [(4, 4), (2, 6), (8, 8)])
def test_pipeline_matches_serial(n_stages, microbatches):
    rng = np.random.RandomState(0)
    dim, batch = 16, 24
    params = _make_params(rng, n_stages, dim)
    stacked = stack_params(params)
    x = jnp.asarray(rng.randn(batch, dim), jnp.float32)

    mesh = _mesh((n_stages,), ("stage",))
    pp = pipeline_spmd(_stage_fn, mesh, "stage", microbatches)
    y = jax.jit(pp)(stacked, x)

    y_ref = x
    for p in params:
        y_ref = _stage_fn(p, y_ref)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)

    # round-trip helper sanity
    back = unstack_params(stacked, n_stages)
    for a, b in zip(back, params):
        np.testing.assert_array_equal(a["w"], b["w"])


def test_pipeline_grads_match_serial():
    rng = np.random.RandomState(1)
    dim, batch, n_stages = 8, 16, 4
    params = _make_params(rng, n_stages, dim)
    stacked = stack_params(params)
    x = jnp.asarray(rng.randn(batch, dim), jnp.float32)
    mesh = _mesh((n_stages,), ("stage",))
    pp = pipeline_spmd(_stage_fn, mesh, "stage", 4)

    def loss_pp(sp):
        y = pp(sp, x)
        return jnp.mean(y * y)

    def loss_ref(plist):
        y = x
        for p in plist:
            y = _stage_fn(p, y)
        return jnp.mean(y * y)

    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp))(stacked)
    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(l_pp, l_ref, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        g_pp, stack_params(g_ref),
    )


def test_pipeline_const_side_inputs():
    """Per-microbatch constants must be routed to the stage working on
    that microbatch (t - s indexing), not the tick index."""
    rng = np.random.RandomState(2)
    dim, batch, n_stages = 8, 16, 4
    params = _make_params(rng, n_stages, dim)
    stacked = stack_params(params)
    x = jnp.asarray(rng.randn(batch, dim), jnp.float32)
    c = jnp.asarray(rng.randn(batch, dim), jnp.float32)

    def stage_c(p, h, const):
        return _stage_fn(p, h) + const

    mesh = _mesh((n_stages,), ("stage",))
    pp = pipeline_spmd(stage_c, mesh, "stage", 4)
    y = jax.jit(pp)(stacked, x, c)

    y_ref = x
    for p in params:
        y_ref = stage_c(p, y_ref, c)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_pipeline_hlo_has_collective_permute():
    rng = np.random.RandomState(3)
    dim = 8
    params = stack_params(_make_params(rng, 4, dim))
    x = jnp.zeros((8, dim), jnp.float32)
    mesh = _mesh((4,), ("stage",))
    pp = pipeline_spmd(_stage_fn, mesh, "stage", 4)
    hlo = jax.jit(pp).lower(params, x).compile().as_text()
    assert "collective-permute" in hlo, "PP lost its ppermute"


def _gemma_pp_setup(n_layers=4):
    from iseg_tpu.nlp.gemma import GemmaCausalLM, get_preset

    cfg = dataclasses.replace(get_preset("gemma_test"), num_layers=n_layers)
    lm = GemmaCausalLM(cfg)
    variables = lm.init(jax.random.PRNGKey(0))
    params = variables["params"]

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, (8, 12)), jnp.int32)
    weights = jnp.asarray(
        (rng.rand(8, 12) > 0.2).astype(np.float32), jnp.float32
    )

    def ref_loss(params):
        logits = lm({"params": params}, ids)
        targets = ids[:, 1:]
        w = weights[:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    return cfg, lm, params, ids, weights, ref_loss


@pytest.mark.parametrize("n_stages", [2, 4])
def test_gemma_pp_loss_and_grads_match(n_stages):
    from iseg_tpu.nlp.gemma.pipeline import (
        from_pipeline_params,
        make_pp_loss_fn,
        to_pipeline_params,
    )

    cfg, lm, params, ids, weights, ref_loss = _gemma_pp_setup()
    mesh = _mesh((n_stages,), ("stage",))
    staged, shared = to_pipeline_params(params, n_stages)

    # round-trip must be exact
    rt = from_pipeline_params(staged, shared)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), rt, params
    )

    loss_fn = make_pp_loss_fn(cfg, mesh, num_microbatches=4)
    l_pp, (g_staged, g_shared) = jax.jit(
        jax.value_and_grad(loss_fn, argnums=(0, 1))
    )(staged, shared, ids, weights)

    l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(l_pp, l_ref, rtol=1e-5, atol=1e-6)

    g_pp_full = from_pipeline_params(g_staged, g_shared)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5),
        g_pp_full, g_ref,
    )


def test_gemma_pp_with_data_axis():
    """DP x PP on a (data, stage) mesh: same loss, grads all-reduced over
    the data axis by the shard_map transpose."""
    from iseg_tpu.nlp.gemma.pipeline import (
        from_pipeline_params,
        make_pp_loss_fn,
        to_pipeline_params,
    )

    cfg, lm, params, ids, weights, ref_loss = _gemma_pp_setup()
    mesh = _mesh((2, 2), ("data", "stage"))
    staged, shared = to_pipeline_params(params, 2)
    loss_fn = make_pp_loss_fn(
        cfg, mesh, num_microbatches=2, batch_axis="data"
    )
    l_pp, (g_staged, g_shared) = jax.jit(
        jax.value_and_grad(loss_fn, argnums=(0, 1))
    )(staged, shared, ids, weights)

    l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(l_pp, l_ref, rtol=1e-5, atol=1e-6)
    g_pp_full = from_pipeline_params(g_staged, g_shared)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5),
        g_pp_full, g_ref,
    )


def test_gemma_pp_train_converges():
    """A few SGD steps through the PP loss must reduce it."""
    import optax

    from iseg_tpu.nlp.gemma.pipeline import make_pp_loss_fn, to_pipeline_params

    cfg, lm, params, ids, weights, _ = _gemma_pp_setup()
    mesh = _mesh((2,), ("stage",))
    staged, shared = to_pipeline_params(params, 2)
    loss_fn = make_pp_loss_fn(cfg, mesh, num_microbatches=4)

    tx = optax.sgd(0.5)
    opt_state = tx.init((staged, shared))

    @jax.jit
    def step(staged, shared, opt_state):
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            staged, shared, ids, weights
        )
        updates, opt_state = tx.update(grads, opt_state)
        staged, shared = optax.apply_updates((staged, shared), updates)
        return staged, shared, opt_state, loss

    losses = []
    for _ in range(8):
        staged, shared, opt_state, loss = step(staged, shared, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses
