"""Gemma module tests: forward, cache-consistency, generation, scoring, TP
layout sharding over the model mesh axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.nlp.gemma import (
    GemmaCausalLM,
    get_layout_map,
    get_preset,
    shard_gemma_params,
)


@pytest.fixture(scope="module")
def lm():
    model = GemmaCausalLM(get_preset("gemma_test"))
    variables = model.init(jax.random.PRNGKey(0), batch=1, seq=8)
    return model, variables


def test_forward_shapes(lm):
    model, variables = lm
    ids = jnp.ones((2, 6), jnp.int32)
    logits = model(variables, ids)
    assert logits.shape == (2, 6, model.config.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_cached_forward_matches_uncached(lm):
    """Prefill + step-wise decode must reproduce the full-sequence logits."""
    model, variables = lm
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 500, (1, 6)), jnp.int32)

    full_logits = model(variables, ids)

    # prefill first 4, then decode tokens 4 and 5 one at a time
    caches = model.build_cache(1, 8)
    positions = jnp.arange(4)[None]
    logits_p, caches = model.call_with_cache(variables, ids[:, :4], caches, 0, positions)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :4]), rtol=2e-4, atol=2e-4)

    for i in (4, 5):
        logits_i, caches = model.call_with_cache(
            variables, ids[:, i : i + 1], caches, i, jnp.full((1, 1), i))
        np.testing.assert_allclose(
            np.asarray(logits_i[:, 0]), np.asarray(full_logits[:, i]),
            rtol=2e-4, atol=2e-4)


def test_greedy_generation_deterministic(lm):
    model, variables = lm
    prompt = jnp.asarray([[5, 7, 11]], jnp.int32)
    lengths = jnp.asarray([3])
    gen = jax.jit(
        lambda v, p, l: model.generate(v, p, l, max_length=8, temperature=0.0)
    )
    out1 = gen(variables, prompt, lengths)
    out2 = gen(variables, prompt, lengths)
    assert out1.shape == (1, 8)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out1[0, :3]), [5, 7, 11])
    assert (np.asarray(out1[0, 3:]) < model.config.vocab_size).all()


def test_generation_matches_stepwise_forward(lm):
    """Greedy generate must equal argmax of repeated full forwards."""
    model, variables = lm
    prompt = jnp.asarray([[9, 2]], jnp.int32)
    out = model.generate(variables, prompt, jnp.asarray([2]), max_length=5)
    ids = [9, 2]
    for _ in range(3):
        logits = model(variables, jnp.asarray([ids], jnp.int32))
        ids.append(int(jnp.argmax(logits[0, -1])))
    np.testing.assert_array_equal(np.asarray(out[0]), ids)


def test_score(lm):
    model, variables = lm
    ids = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    lp = model.score(variables, ids)
    assert lp.shape == (1, 4)
    assert (np.asarray(lp) <= 0).all()


def test_cache_decode_without_positions_raises(lm):
    # defaulting positions to arange(t) against a cache would RoPE the
    # token at position 0 and mask away the cache — must refuse loudly
    model, variables = lm
    caches = model.build_cache(1, 8)
    with pytest.raises(ValueError, match="positions"):
        model.backbone.apply(
            variables, jnp.zeros((1, 1), jnp.int32),
            caches=caches, cache_index=5,
        )


def test_tp_layout_shards_over_model_axis():
    from iseg_tpu.parallel.mesh import create_mesh

    model = GemmaCausalLM(get_preset("gemma_test"))
    variables = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh(model_parallelism=2)  # 4 data x 2 model
    params = shard_gemma_params(variables["params"], mesh)

    specs = get_layout_map(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    sharded_paths = [
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, s in flat if any(a is not None for a in s)
    ]
    assert any("query" in p for p in sharded_paths)
    assert any("gating_ffw" in p for p in sharded_paths)
    assert any("token_embedding" in p for p in sharded_paths)

    # forward under the mesh still works (GSPMD handles the TP collectives)
    logits = model(
        {"params": params,
         **{k: v for k, v in variables.items() if k != "params"}},
        jnp.ones((2, 4), jnp.int32),
    )
    assert logits.shape == (2, 4, model.config.vocab_size)


def test_preset_names_match_reference():
    """Reference gemma_presets.py ships 2b/7b + instruct variants."""
    from iseg_tpu.nlp.gemma.config import GEMMA_PRESETS, get_preset

    for name in ("gemma_2b_en", "gemma_7b_en",
                 "gemma_instruct_2b_en", "gemma_instruct_7b_en"):
        assert name in GEMMA_PRESETS
    assert get_preset("gemma_instruct_2b_en") == get_preset("gemma_2b_en")
    assert get_preset("gemma_instruct_7b_en") == get_preset("gemma_7b_en")


def test_dpa_path_matches_einsum(lm, monkeypatch):
    """The fused dot_product_attention path (T >= DPA_MIN_SEQLEN) must
    reproduce the einsum chain (probe: tools/probe_gemma_attention.py)."""
    from iseg_tpu.nlp.gemma import model as model_mod

    model, variables = lm
    ids = jnp.asarray(
        np.random.RandomState(1).randint(1, 500, (2, 6)), jnp.int32)

    monkeypatch.setattr(model_mod, "DPA_MIN_SEQLEN", 10 ** 9)
    ref = np.asarray(model(variables, ids))

    monkeypatch.setattr(model_mod, "DPA_MIN_SEQLEN", 1)
    got = np.asarray(model(variables, ids))

    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
