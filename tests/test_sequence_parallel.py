"""Sequence parallelism for Gemma (model.py seq_axis constraints).

SP must be numerically invisible (same logits/loss/grads as the
unsharded forward) while actually sharding the sequence dim — verified
by the all-gather GSPMD inserts for the attention K/V context.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iseg_tpu.nlp.gemma import GemmaCausalLM, get_preset


def _mesh(shape, names):
    n = int(np.prod(shape))
    return Mesh(np.asarray(jax.devices()[:n]).reshape(shape), names)


@pytest.fixture(scope="module")
def setup():
    cfg = get_preset("gemma_test")
    lm_ref = GemmaCausalLM(cfg)
    variables = lm_ref.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, (4, 16)), jnp.int32)
    return cfg, lm_ref, variables, ids


def test_sp_logits_match(setup):
    cfg, lm_ref, variables, ids = setup
    ref = lm_ref(variables, ids)

    mesh = _mesh((2, 4), ("data", "model"))
    lm_sp = GemmaCausalLM(cfg, seq_axis="model", data_axis="data")
    with jax.set_mesh(mesh):
        ids_s = jax.device_put(ids, NamedSharding(mesh, P("data", "model")))
        got = jax.jit(lambda v, i: lm_sp(v, i))(variables, ids_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_sp_hlo_has_all_gather(setup):
    cfg, _, variables, ids = setup
    mesh = _mesh((1, 8), ("data", "model"))
    lm_sp = GemmaCausalLM(cfg, seq_axis="model", data_axis="data")
    with jax.set_mesh(mesh):
        ids_s = jax.device_put(ids, NamedSharding(mesh, P("data", "model")))
        hlo = (
            jax.jit(lambda v, i: lm_sp(v, i))
            .lower(variables, ids_s).compile().as_text()
        )
    assert "all-gather" in hlo or "all-to-all" in hlo, (
        "SP forward lost its K/V gather"
    )


def test_sp_loss_and_grads_match(setup):
    cfg, lm_ref, variables, ids = setup
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
    lm_sp = GemmaCausalLM(cfg, seq_axis="model", data_axis="data")
    with jax.set_mesh(mesh):
        ids_s = jax.device_put(ids, NamedSharding(mesh, P("data", "model")))
        l_sp, g_sp = jax.jit(
            jax.value_and_grad(lambda p: loss_with(lm_sp, p, ids_s))
        )(params)
        l_sp, g_sp = jax.device_get((l_sp, g_sp))

    np.testing.assert_allclose(l_sp, l_ref, rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        ),
        g_sp, g_ref,
    )


def test_sp_score_matches(setup):
    cfg, lm_ref, variables, ids = setup
    ref = lm_ref.score(variables, ids)
    mesh = _mesh((2, 4), ("data", "model"))
    lm_sp = GemmaCausalLM(cfg, seq_axis="model", data_axis="data")
    with jax.set_mesh(mesh):
        ids_s = jax.device_put(ids, NamedSharding(mesh, P("data", "model")))
        got = jax.jit(lm_sp.score)(variables, ids_s)
        got = jax.device_get(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_sp_generation_unaffected(setup):
    """seq_axis must not disturb cached decode (constraints are gated on
    cache=None): generation with an SP-configured LM, run on the default
    devices, matches the plain LM."""
    cfg, lm_ref, variables, ids = setup
    prompts = ids[:, :6]
    lengths = jnp.full((prompts.shape[0],), 6, jnp.int32)
    out_ref = lm_ref.generate(variables, prompts, lengths, max_length=10)
    lm_sp = GemmaCausalLM(cfg, seq_axis="model", data_axis="data")
    out_sp = lm_sp.generate(variables, prompts, lengths, max_length=10)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_sp))
