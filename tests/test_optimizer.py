import jax
import jax.numpy as jnp
import numpy as np
import optax

from iseg_tpu.core.optimizer import (
    get_optimizer,
    get_multi_optimizer,
    lr_multiplier_tree,
    warmup_cosine_decay,
    warmup_poly_decay,
    weight_decay_mask,
)


def test_poly_decay_values():
    # mirrors the reference's __main__ check (optimizers/polydecay.py:90-98)
    sched = warmup_poly_decay(0.01, decay_steps=1000, power=0.9, warmup_steps=100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(50)), 0.005, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), 0.01, rtol=1e-5)
    assert float(sched(1000)) < 1e-8
    # monotonic decay after warmup
    vals = [float(sched(s)) for s in range(100, 1000, 100)]
    assert all(a > b for a, b in zip(vals, vals[1:]))


def test_cosine_decay_with_warmup():
    sched = warmup_cosine_decay(0.01, decay_steps=1000, warmup_steps=100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(100)), 0.01, rtol=1e-4)
    assert float(sched(1000)) < 1e-4


def _params():
    return {
        "backbone": {
            "conv": {"kernel": jnp.ones((3, 3, 4, 4)), "bias": jnp.ones((4,))},
            "norm": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
        },
        "head": {"conv": {"kernel": jnp.ones((1, 1, 4, 2))}},
    }


def test_weight_decay_mask_excludes_norm_and_bias():
    mask = weight_decay_mask(_params())
    assert mask["backbone"]["conv"]["kernel"] is True
    assert mask["backbone"]["conv"]["bias"] is False
    assert mask["backbone"]["norm"]["scale"] is False
    assert mask["head"]["conv"]["kernel"] is True


def test_lr_multiplier_tree():
    mt = lr_multiplier_tree(_params(), {"backbone": 0.1})
    assert mt["backbone"]["conv"]["kernel"] == 0.1
    assert mt["head"]["conv"]["kernel"] == 1.0


def test_get_optimizer_sgd_step():
    params = _params()
    tx, sched = get_optimizer(params, "sgd", learning_rate=0.1, train_steps=100)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    # params moved opposite the gradient
    assert float(new["head"]["conv"]["kernel"][0, 0, 0, 0]) < 1.0


def test_get_optimizer_adamw_with_multipliers():
    params = _params()
    tx, _ = get_optimizer(
        params,
        "adamw",
        learning_rate=0.1,
        weight_decay=1e-4,
        lr_multipliers={"backbone": 0.0},  # freeze backbone via multiplier
        decay_strategy="none",
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["backbone"]["conv"]["kernel"]), 0.0)
    assert float(np.abs(np.asarray(updates["head"]["conv"]["kernel"])).max()) > 0


def test_adam_weight_decay_is_applied():
    # a requested weight_decay must never silently vanish for adam/amsgrad
    params = _params()
    for name in ("adam", "amsgrad"):
        tx_wd, _ = get_optimizer(params, name, learning_rate=0.1,
                                 weight_decay=0.5, decay_strategy="none")
        tx_no, _ = get_optimizer(params, name, learning_rate=0.1,
                                 weight_decay=0.0, decay_strategy="none")
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        u_wd, _ = tx_wd.update(zeros, tx_wd.init(params), params)
        u_no, _ = tx_no.update(zeros, tx_no.init(params), params)
        # with zero grads, only the decay term moves the kernel
        assert float(np.abs(np.asarray(
            u_wd["head"]["conv"]["kernel"])).max()) > 0, name
        np.testing.assert_allclose(
            np.asarray(u_no["head"]["conv"]["kernel"]), 0.0, atol=1e-7)


def test_optimizer_list_with_lr_multipliers_steps():
    # lr_multipliers inside a multi_transform used to crash: the masked
    # update tree (MaskedNode leaves) mismatched the full multiplier tree
    from iseg_tpu.core.optimizer import get_optimizer_list

    params = _params()
    tx = get_optimizer_list(
        params,
        group_patterns=["backbone", "head"],
        names=["sgd", "adamw"],
        learning_rates=[0.1, 0.01],
        default_group=1,
        lr_multipliers={"conv": 0.5},
        decay_strategy="none",
        train_steps=10,
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)  # must not raise
    assert float(np.abs(np.asarray(updates["head"]["conv"]["kernel"])).max()) > 0


def test_cosine_end_learning_rate_floor():
    params = _params()
    _, sched = get_optimizer(params, "sgd", learning_rate=1.0,
                             train_steps=100, decay_strategy="cosine",
                             end_learning_rate=0.05)
    assert abs(float(sched(100)) - 0.05) < 1e-6


def test_nan_grads_scrubbed():
    params = {"w": jnp.ones((2,))}
    tx, _ = get_optimizer(params, "sgd", learning_rate=0.1, decay_strategy="none")
    state = tx.init(params)
    grads = {"w": jnp.array([jnp.nan, 1.0])}
    updates, _ = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_amsgrad_runs():
    params = {"w": jnp.ones((2,))}
    tx, _ = get_optimizer(params, "amsgrad", learning_rate=0.1)
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((2,))}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_multi_optimizer_routes_by_name():
    params = _params()
    tx = get_multi_optimizer(
        params,
        label_fn=lambda path: "backbone" if "backbone" in path else "head",
        optimizers={
            "backbone": optax.sgd(0.0),
            "head": optax.sgd(1.0),
        },
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["backbone"]["conv"]["kernel"]), 0.0)
    np.testing.assert_allclose(np.asarray(updates["head"]["conv"]["kernel"]), -1.0)
