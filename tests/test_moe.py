"""MoE feed-forward + expert parallelism (nn/moe.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iseg_tpu.nn.moe import MoEFeedForward, topk_dispatch


def _mesh(shape, names):
    n = int(np.prod(shape))
    return Mesh(np.asarray(jax.devices()[:n]).reshape(shape), names)


def _dense_reference(params, x, k):
    """Per-token dense evaluation of the same routing (no capacity).
    k=1 uses the raw router prob as the gate (Switch eq. 2); k>1
    renormalizes over the selected k (GShard)."""
    wg, w1, w2 = params["router"], params["w1"], params["w2"]
    probs = jax.nn.softmax(x.astype(jnp.float32) @ wg, axis=-1)
    out = np.zeros_like(np.asarray(x))
    probs_np = np.asarray(probs)
    for g in range(x.shape[0]):
        order = np.argsort(-probs_np[g])
        chosen = order[:k]
        gates = probs_np[g, chosen]
        if k > 1:
            gates = gates / gates.sum()
        for gate, e in zip(gates, chosen):
            h = jax.nn.gelu(x[g] @ w1[e])
            out[g] += gate * np.asarray(h @ w2[e])
    return out


@pytest.mark.parametrize("k", [1, 2])
def test_moe_matches_dense_routing(k):
    """With ample capacity nothing is dropped: the einsum-dispatched
    output equals the per-token dense evaluation."""
    rng = np.random.RandomState(0)
    g, d, e, ff = 32, 8, 4, 16
    x = jnp.asarray(rng.randn(g, d), jnp.float32)
    moe = MoEFeedForward(num_experts=e, d_ff=ff, k=k, capacity_factor=4.0)
    variables = moe.init(jax.random.PRNGKey(0), x)
    y, aux = moe.apply(variables, x)
    ref = _dense_reference(variables["params"], x, k)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)
    assert np.isfinite(float(aux))


def test_moe_capacity_drops_tokens():
    """With capacity 1 slot per expert, overflow tokens contribute zero
    output (the standard drop semantics)."""
    rng = np.random.RandomState(1)
    g, d, e = 16, 8, 2
    x = jnp.asarray(rng.randn(g, d), jnp.float32)
    # capacity = ceil(cf * k * G / E) with cf tiny -> 1..2 slots
    moe = MoEFeedForward(num_experts=e, d_ff=8, k=1, capacity_factor=0.1)
    variables = moe.init(jax.random.PRNGKey(0), x)
    y, _ = moe.apply(variables, x)
    # at most E * capacity tokens can be served; the rest must be zero rows
    zero_rows = np.sum(~np.any(np.asarray(y) != 0, axis=-1))
    assert zero_rows >= g - 2 * e, f"expected drops, zero rows={zero_rows}"


def test_topk_dispatch_positions_respect_capacity():
    probs = jnp.asarray(np.random.RandomState(2).rand(64, 4))
    probs = probs / probs.sum(-1, keepdims=True)
    capacity = 8
    combine, dispatch, aux = topk_dispatch(probs, 2, capacity)
    # each (expert, slot) is used by at most one token
    slot_use = np.asarray(dispatch).sum(axis=0)  # [E, C]
    assert slot_use.max() <= 1
    # gates of surviving tokens sum to <= 1 (== 1 when none dropped)
    sums = np.asarray(combine).sum(axis=(1, 2))
    assert np.all(sums <= 1.0 + 1e-5)


def test_moe_aux_loss_balanced_is_near_one():
    """Uniform router -> aux ~= 1 (its minimum); skewed router -> larger."""
    g, e = 4096, 8
    uniform = jnp.full((g, e), 1.0 / e)
    _, _, aux_u = topk_dispatch(uniform, 1, g)
    # argmax ties all resolve to expert 0, but P_e stays uniform:
    # aux = E * sum(f * 1/E) = 1 regardless of f
    np.testing.assert_allclose(float(aux_u), 1.0, rtol=1e-5)

    skew = jax.nn.softmax(
        jnp.asarray(np.random.RandomState(3).randn(g, e) * 4.0), -1
    )
    _, _, aux_s = topk_dispatch(skew, 1, g)
    assert float(aux_s) > 1.0


def test_moe_expert_parallel_matches_and_has_collectives():
    rng = np.random.RandomState(4)
    g, d, e, ff = 64, 8, 8, 16
    x = jnp.asarray(rng.randn(g, d), jnp.float32)
    moe = MoEFeedForward(num_experts=e, d_ff=ff, k=2, capacity_factor=2.0)
    variables = moe.init(jax.random.PRNGKey(0), x)
    y_ref, aux_ref = moe.apply(variables, x)

    mesh = _mesh((8,), ("expert",))
    moe_ep = MoEFeedForward(num_experts=e, d_ff=ff, k=2,
                            capacity_factor=2.0, expert_axis="expert")
    ep_params = jax.tree_util.tree_map(
        lambda p: jax.device_put(p, NamedSharding(mesh, P())),
        variables,
    )
    with jax.set_mesh(mesh):
        fn = jax.jit(lambda v, x: moe_ep.apply(v, x))
        y_ep, aux_ep = fn(ep_params, x)
        hlo = fn.lower(ep_params, x).compile().as_text()
        y_ep, aux_ep = jax.device_get((y_ep, aux_ep))

    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(aux_ep), float(aux_ref), rtol=1e-5)
    assert any(c in hlo for c in ("all-to-all", "all-gather",
                                  "collective-permute", "all-reduce")), (
        "EP run compiled without any cross-device collective"
    )


def test_moe_k1_router_gets_task_gradient():
    """Switch (k=1) gating must keep the raw router prob as the combine
    weight: the router's task-loss gradient is nonzero (renormalizing a
    single gate to 1 would sever it)."""
    rng = np.random.RandomState(7)
    g, d, e, ff = 64, 8, 4, 16
    x = jnp.asarray(rng.randn(g, d), jnp.float32)
    moe = MoEFeedForward(num_experts=e, d_ff=ff, k=1, capacity_factor=2.0)
    variables = moe.init(jax.random.PRNGKey(0), x)

    def task_loss(p):
        y, _ = moe.apply({"params": p}, x)  # NO aux-loss term
        return jnp.mean((y - x) ** 2)

    grads = jax.grad(task_loss)(variables["params"])
    router_grad = np.abs(np.asarray(grads["router"])).max()
    assert router_grad > 1e-6, (
        f"k=1 router task gradient is dead: max |grad| = {router_grad}"
    )


def test_moe_grads_finite_and_balance_trainable():
    """Aux loss must push the router toward balance when trained."""
    import optax

    rng = np.random.RandomState(5)
    g, d, e, ff = 128, 8, 4, 16
    x = jnp.asarray(rng.randn(g, d), jnp.float32)
    moe = MoEFeedForward(num_experts=e, d_ff=ff, k=1, capacity_factor=2.0)
    variables = moe.init(jax.random.PRNGKey(1), x)
    params = variables["params"]

    def loss_fn(p):
        y, aux = moe.apply({"params": p}, x)
        return jnp.mean((y - x) ** 2) + 0.01 * aux, aux

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = tx.update(grads, s)
        return optax.apply_updates(p, updates), s, loss, aux

    losses = []
    for _ in range(30):
        params, opt_state, loss, aux = step(params, opt_state)
        assert np.isfinite(float(loss))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
