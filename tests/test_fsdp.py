"""ZeRO/FSDP parameter + optimizer-state sharding (parallel/fsdp.py).

FSDP must be numerically invisible (identical losses and final params vs
replicated DP training) while actually sharding the big leaves 8-way and
making GSPMD insert all-gather (param use) + reduce-scatter (grads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iseg_tpu.nlp.gemma import GemmaCausalLM, get_preset
from iseg_tpu.parallel.fsdp import fsdp_spec, fsdp_shardings, shard_fsdp


def _mesh(n, name="data"):
    return Mesh(np.asarray(jax.devices()[:n]), (name,))


def test_fsdp_spec_policy():
    # largest divisible dim wins
    assert fsdp_spec((128, 512, 64), 8, min_size=1) == P(None, "data", None)
    # indivisible everywhere -> replicated
    assert fsdp_spec((7, 9), 8, min_size=1) == P()
    # small leaves stay replicated regardless of divisibility
    assert fsdp_spec((64,), 8, min_size=2 ** 14) == P()
    # scalar (optax count) -> replicated
    assert fsdp_spec((), 8, min_size=1) == P()


@pytest.fixture(scope="module")
def lm_setup():
    cfg = get_preset("gemma_test")
    lm = GemmaCausalLM(cfg)
    variables = lm.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, (8, 16)), jnp.int32)

    def loss_fn(params, ids):
        logits = lm({"params": params}, ids)
        targets = ids[:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        return -jnp.mean(
            jnp.take_along_axis(lp, targets[..., None], axis=-1)
        )

    return lm, variables["params"], ids, loss_fn


def _train(params, ids, loss_fn, tx, n_steps, shardings=None, mesh=None,
           data_sharding=None):
    opt_state = tx.init(params)
    if shardings is not None:
        params = jax.tree_util.tree_map(jax.device_put, params, shardings)
        opt_state = jax.tree_util.tree_map(
            jax.device_put, opt_state, fsdp_shardings(opt_state, mesh,
                                                      min_size=1)
        )
    if data_sharding is not None:
        ids = jax.device_put(ids, data_sharding)

    @jax.jit
    def step(params, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, ids)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state, ids)
        losses.append(float(loss))
    return params, losses


def test_fsdp_train_matches_replicated(lm_setup):
    _, params, ids, loss_fn = lm_setup
    tx = optax.adam(1e-2)
    p_ref, l_ref = _train(params, ids, loss_fn, tx, 3)

    mesh = _mesh(8)
    sh = fsdp_shardings(params, mesh, min_size=1)
    p_fsdp, l_fsdp = _train(
        params, ids, loss_fn, tx, 3, shardings=sh, mesh=mesh,
        data_sharding=NamedSharding(mesh, P("data")),
    )
    np.testing.assert_allclose(l_fsdp, l_ref, rtol=1e-5, atol=1e-6)
    # sharded vs replicated compilations reduce in different orders;
    # 3 adam steps at lr 1e-2 amplify the f32 reassociation noise
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=6e-4, atol=1e-5
        ),
        jax.device_get(p_fsdp), jax.device_get(p_ref),
    )


def test_fsdp_shards_are_actually_small(lm_setup):
    """The embedding table must live 1/8th-per-device, not replicated."""
    _, params, _, _ = lm_setup
    mesh = _mesh(8)
    sharded = shard_fsdp(params, mesh, min_size=1)
    emb = sharded["token_embedding"]["embedding"]
    local = emb.addressable_shards[0].data
    assert local.size * 8 == emb.size, (
        f"expected 8-way shard, got local {local.shape} of {emb.shape}"
    )


def test_fsdp_hlo_has_gather_and_reduce_scatter(lm_setup):
    _, params, ids, loss_fn = lm_setup
    mesh = _mesh(8)
    sh = fsdp_shardings(params, mesh, min_size=1)
    params_s = jax.tree_util.tree_map(jax.device_put, params, sh)
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("data")))

    hlo = (
        jax.jit(jax.grad(loss_fn))
        .lower(params_s, ids_s).compile().as_text()
    )
    assert "all-gather" in hlo, "FSDP params are not gathered at use"
    # grads must come back sharded: TPU emits a fused reduce-scatter;
    # XLA:CPU lowers the same pattern as all-reduce + dynamic-slice
    assert "reduce-scatter" in hlo or (
        "all-reduce" in hlo and "dynamic-slice" in hlo
    ), "FSDP grads are not scattered back to shards"


def test_zero1_optimizer_state_only(lm_setup):
    """ZeRO-1: replicated params, sharded optimizer state — same numerics."""
    _, params, ids, loss_fn = lm_setup
    tx = optax.adam(1e-2)
    p_ref, l_ref = _train(params, ids, loss_fn, tx, 2)

    mesh = _mesh(8)
    opt_state = tx.init(params)
    opt_sh = fsdp_shardings(opt_state, mesh, min_size=1)
    opt_state = jax.tree_util.tree_map(jax.device_put, opt_state, opt_sh)

    @jax.jit
    def step(params, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, ids)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p = params
    losses = []
    for _ in range(2):
        p, opt_state, loss = step(p, opt_state, ids)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, l_ref, rtol=1e-5, atol=1e-6)
    # sharded vs replicated compilations reduce in different orders;
    # 3 adam steps at lr 1e-2 amplify the f32 reassociation noise
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=6e-4, atol=1e-5
        ),
        jax.device_get(p), jax.device_get(p_ref),
    )
