"""Sampler-family parity (reference compiles any keras-nlp sampler through
``compile(sampler=...)``, gemma_causal.py:44-76): pluggable seam, top-p,
beam search — each sampling config one compiled program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.nlp.gemma import (
    BeamSampler,
    ContrastiveSampler,
    GemmaCausalLM,
    GreedySampler,
    RandomSampler,
    TopKSampler,
    TopPSampler,
    get_preset,
    get_sampler,
)


@pytest.fixture(scope="module")
def lm():
    model = GemmaCausalLM(get_preset("gemma_test"))
    variables = model.init(jax.random.PRNGKey(0), batch=1, seq=8)
    return model, variables


# -- unit: sampler.sample on crafted logits --------------------------------


def test_get_sampler_resolution():
    assert isinstance(get_sampler(None), GreedySampler)
    assert isinstance(get_sampler("greedy"), GreedySampler)
    assert isinstance(get_sampler("top_p", p=0.5), TopPSampler)
    assert get_sampler("top_p", p=0.5).p == 0.5
    assert isinstance(get_sampler("beam", num_beams=3), BeamSampler)
    s = TopKSampler(k=7)
    assert get_sampler(s) is s
    with pytest.raises(ValueError):
        get_sampler("nope")


def test_top_p_restricts_to_nucleus():
    """With probs [0.6, 0.3, 0.08, 0.02] and p=0.7 the nucleus is
    {0, 1} (token 1 crosses the 0.7 mass and is included; 2, 3 never)."""
    probs = jnp.asarray([[0.6, 0.3, 0.08, 0.02]])
    logits = jnp.log(probs)
    sampler = TopPSampler(p=0.7)
    seen = set()
    for i in range(200):
        tok = sampler.sample(logits, jax.random.PRNGKey(i))
        seen.add(int(tok[0]))
    assert seen == {0, 1}


def test_top_p_with_k_truncation():
    """k pre-truncation composes: k=2 then p=1.0 allows exactly {0, 1}."""
    logits = jnp.log(jnp.asarray([[0.4, 0.3, 0.2, 0.1]]))
    sampler = TopPSampler(p=1.0, k=2)
    seen = {int(sampler.sample(logits, jax.random.PRNGKey(i))[0])
            for i in range(100)}
    assert seen == {0, 1}


def test_top_p_tiny_p_is_greedy():
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 16))
    sampler = TopPSampler(p=1e-6)
    tok = sampler.sample(logits, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(tok),
                                  np.argmax(np.asarray(logits), -1))


def test_zero_temperature_is_greedy_for_all_flat_samplers():
    logits = jnp.asarray(np.random.RandomState(1).randn(3, 32))
    expect = np.argmax(np.asarray(logits), -1)
    for s in (RandomSampler(temperature=0.0), TopKSampler(5, 0.0),
              TopPSampler(0.9, None, 0.0)):
        np.testing.assert_array_equal(
            np.asarray(s.sample(logits, jax.random.PRNGKey(0))), expect)


def test_top_k_stays_in_top_k():
    logits = jnp.asarray([[5.0, 4.0, 3.0, -10.0, -10.0, -10.0]])
    sampler = TopKSampler(k=3, temperature=1.0)
    for i in range(50):
        assert int(sampler.sample(logits, jax.random.PRNGKey(i))[0]) in {0, 1, 2}


# -- generate() through the seam -------------------------------------------


def test_generate_sampler_seam_greedy_equivalence(lm):
    """sampler="greedy", GreedySampler(), and the temperature=0 shorthand
    produce identical output through the jitted program."""
    model, variables = lm
    prompt = jnp.asarray([[5, 7, 11]], jnp.int32)
    lengths = jnp.asarray([3])
    a = model.generate(variables, prompt, lengths, max_length=8,
                       temperature=0.0)
    b = model.generate(variables, prompt, lengths, max_length=8,
                       sampler="greedy")
    c = model.generate(variables, prompt, lengths, max_length=8,
                       sampler=GreedySampler())
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_generate_top_p_near_zero_temperature_matches_greedy(lm):
    """VERDICT round-2 done-criterion: top-p at temperature -> 0 equals
    greedy decoding."""
    model, variables = lm
    prompt = jnp.asarray([[9, 2, 4]], jnp.int32)
    lengths = jnp.asarray([3])
    greedy = model.generate(variables, prompt, lengths, max_length=8)
    nucleus = model.generate(
        variables, prompt, lengths, max_length=8,
        sampler=TopPSampler(p=0.9, temperature=1e-4),
        rng=jax.random.PRNGKey(3),
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(nucleus))


def test_generate_top_p_kwarg_shorthand(lm):
    model, variables = lm
    prompt = jnp.asarray([[5, 7]], jnp.int32)
    lengths = jnp.asarray([2])
    out = model.generate(variables, prompt, lengths, max_length=6,
                         top_p=0.8, temperature=0.7,
                         rng=jax.random.PRNGKey(0))
    assert out.shape == (1, 6)
    assert (np.asarray(out) < model.config.vocab_size).all()
    key = next(k for k in model._generate_jit
               if isinstance(k[1], TopPSampler) and k[1].p == 0.8)
    assert key[1].temperature == 0.7


def test_one_program_per_sampling_config(lm):
    """Each distinct sampler config compiles exactly one cached program;
    repeat calls reuse it."""
    model, variables = lm
    model._generate_jit.clear()
    prompt = jnp.asarray([[5, 7]], jnp.int32)
    lengths = jnp.asarray([2])
    for _ in range(2):
        model.generate(variables, prompt, lengths, max_length=6)
        model.generate(variables, prompt, lengths, max_length=6,
                       sampler=TopPSampler(p=0.9))
        model.generate(variables, prompt, lengths, max_length=6,
                       sampler=BeamSampler(num_beams=2))
    assert len(model._generate_jit) == 3


# -- beam search ------------------------------------------------------------


def _sequence_loglik(model, variables, ids):
    """Sum per-token log-likelihood of the generated continuation."""
    lp = model.score(variables, jnp.asarray([ids], jnp.int32))
    return float(jnp.sum(lp))


def test_beam_single_beam_equals_greedy(lm):
    """num_beams=1 degenerates to greedy decoding."""
    model, variables = lm
    prompt = jnp.asarray([[5, 7, 11]], jnp.int32)
    lengths = jnp.asarray([3])
    greedy = model.generate(variables, prompt, lengths, max_length=8)
    beam1 = model.generate(variables, prompt, lengths, max_length=8,
                           sampler=BeamSampler(num_beams=1))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))


def test_beam_improves_or_matches_likelihood(lm):
    """VERDICT round-2 done-criterion: beam search's sequence
    log-likelihood >= greedy's on the test config."""
    model, variables = lm
    prompts = [[5, 7, 11], [9, 2, 4], [1, 3, 13]]
    improved = 0
    for ids in prompts:
        prompt = jnp.asarray([ids], jnp.int32)
        lengths = jnp.asarray([3])
        greedy = model.generate(variables, prompt, lengths, max_length=9)
        beam = model.generate(variables, prompt, lengths, max_length=9,
                              sampler=BeamSampler(num_beams=4))
        ll_greedy = _sequence_loglik(model, variables,
                                     list(np.asarray(greedy[0])))
        ll_beam = _sequence_loglik(model, variables,
                                   list(np.asarray(beam[0])))
        assert ll_beam >= ll_greedy - 1e-4, (ids, ll_beam, ll_greedy)
        if ll_beam > ll_greedy + 1e-4:
            improved += 1
    # on a random-init model beams nearly always find a better sequence
    assert improved >= 1


def test_beam_preserves_prompt_and_batch(lm):
    model, variables = lm
    prompt = jnp.asarray([[5, 7, 11], [2, 9, 0]], jnp.int32)
    lengths = jnp.asarray([3, 2])
    out = model.generate(variables, prompt, lengths, max_length=7,
                         sampler=BeamSampler(num_beams=3))
    assert out.shape == (2, 7)
    np.testing.assert_array_equal(np.asarray(out[0, :3]), [5, 7, 11])
    np.testing.assert_array_equal(np.asarray(out[1, :2]), [2, 9])
    assert (np.asarray(out) < model.config.vocab_size).all()


def test_ragged_prompts_fill_pad_gap_and_match_unpadded(lm):
    """Rows shorter than the prompt buffer must generate from their OWN
    length (keras-nlp semantics): the pad gap [length, P) is filled with
    generated tokens, and the row's output equals generating it alone
    with no padding (pad tokens influence nothing)."""
    model, variables = lm
    prompt = jnp.asarray([[5, 7, 11], [2, 9, 0]], jnp.int32)
    lengths = jnp.asarray([3, 2])

    for sampler in (GreedySampler(), BeamSampler(num_beams=2),
                    ContrastiveSampler(k=2, alpha=0.3)):
        out = model.generate(variables, prompt, lengths, max_length=7,
                             sampler=sampler)
        solo1 = model.generate(variables, jnp.asarray([[2, 9]], jnp.int32),
                               jnp.asarray([2]), max_length=7,
                               sampler=sampler)
        solo0 = model.generate(variables,
                               jnp.asarray([[5, 7, 11]], jnp.int32),
                               jnp.asarray([3]), max_length=7,
                               sampler=sampler)
        name = type(sampler).__name__
        np.testing.assert_array_equal(
            np.asarray(out[1]), np.asarray(solo1[0]), err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(out[0]), np.asarray(solo0[0]), err_msg=name)
        # the former pad column holds a real generated token
        np.testing.assert_array_equal(np.asarray(out[1, :2]), [2, 9])


def test_contrastive_alpha_zero_is_greedy(lm):
    """With alpha=0 the contrastive score is the raw probability, so the
    search degenerates to greedy decoding regardless of k."""
    model, variables = lm
    prompt = jnp.asarray([[5, 7, 11]], jnp.int32)
    lengths = jnp.asarray([3])
    greedy = model.generate(variables, prompt, lengths, max_length=8)
    contrastive = model.generate(
        variables, prompt, lengths, max_length=8,
        sampler=ContrastiveSampler(k=4, alpha=0.0))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(contrastive))


def test_contrastive_penalty_changes_output(lm):
    """With a strong degeneration penalty the chosen continuation may
    leave the greedy path but must stay a valid top-k candidate stream."""
    model, variables = lm
    prompt = jnp.asarray([[9, 2, 4], [5, 7, 11]], jnp.int32)
    lengths = jnp.asarray([3, 3])
    out = model.generate(
        variables, prompt, lengths, max_length=9,
        sampler=ContrastiveSampler(k=4, alpha=0.9))
    assert out.shape == (2, 9)
    np.testing.assert_array_equal(np.asarray(out[0, :3]), [9, 2, 4])
    assert (np.asarray(out) < model.config.vocab_size).all()
    # determinism: contrastive search has no randomness
    out2 = model.generate(
        variables, prompt, lengths, max_length=9,
        sampler=ContrastiveSampler(k=4, alpha=0.9))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_contrastive_batch_composition_independent(lm):
    """Per-sample prompt-length masking: a sample's contrastive output
    must not change with the other rows in the batch (pad-row prefill
    states excluded from the penalty)."""
    model, variables = lm
    sampler = ContrastiveSampler(k=4, alpha=0.9)
    solo = model.generate(
        variables, jnp.asarray([[9, 2, 4]], jnp.int32), jnp.asarray([3]),
        max_length=8, sampler=sampler)
    batched = model.generate(
        variables, jnp.asarray([[9, 2, 4], [5, 0, 0]], jnp.int32),
        jnp.asarray([3, 1]), max_length=8, sampler=sampler)
    np.testing.assert_array_equal(np.asarray(solo[0]), np.asarray(batched[0]))


def test_named_sampler_picks_up_shorthand_kwargs(lm):
    """sampler=\"top_k\" + top_k=20/temperature=0.7 must configure the
    sampler, not silently fall back to defaults."""
    model, variables = lm
    model._generate_jit.clear()
    prompt = jnp.asarray([[5, 7]], jnp.int32)
    model.generate(variables, prompt, jnp.asarray([2]), max_length=6,
                   sampler="top_k", top_k=20, temperature=0.7,
                   rng=jax.random.PRNGKey(0))
    key = next(k for k in model._generate_jit
               if isinstance(k[1], TopKSampler))
    assert key[1].k == 20 and key[1].temperature == 0.7
    model.generate(variables, prompt, jnp.asarray([2]), max_length=6,
                   sampler="top_p", top_p=0.8,
                   rng=jax.random.PRNGKey(0))
    key = next(k for k in model._generate_jit
               if isinstance(k[1], TopPSampler))
    assert key[1].p == 0.8


def test_contrastive_named_resolution(lm):
    model, variables = lm
    prompt = jnp.asarray([[5, 7]], jnp.int32)
    out = model.generate(variables, prompt, jnp.asarray([2]), max_length=6,
                         sampler="contrastive")
    assert out.shape == (1, 6)
    assert isinstance(get_sampler("contrastive", k=3, alpha=0.5),
                      ContrastiveSampler)


def test_beam_stops_at_end_token(lm):
    """Once a beam emits the end token it freezes (pad continuation)."""
    model, variables = lm
    prompt = jnp.asarray([[5, 7]], jnp.int32)
    lengths = jnp.asarray([2])
    # pick the greedy first generated token as the "end token" to force an
    # immediate stop on the best beam
    greedy = model.generate(variables, prompt, lengths, max_length=8)
    end_id = int(np.asarray(greedy)[0, 2])
    out = model.generate(variables, prompt, lengths, max_length=8,
                         sampler=BeamSampler(num_beams=2),
                         end_token_id=end_id)
    arr = np.asarray(out[0])
    if end_id in arr[2:]:
        stop = 2 + list(arr[2:]).index(end_id)
        assert (arr[stop + 1:] == 0).all()


# -- segmented cache equivalence (VERDICT r3 #6) ----------------------------


def test_beam_segmented_matches_monolithic(lm):
    """The segmented beam path (shared prompt context + growing active
    cache, causal_lm._generate_beam_impl) picks the same tokens as the
    monolithic full-cache-gather formulation. segment_len=4 forces
    several growth boundaries inside one generation; ragged prompt
    lengths exercise the forced-on-prompt active writes."""
    model, variables = lm
    prompt = jnp.asarray([[5, 9, 3, 7], [11, 2, 0, 0]], jnp.int32)
    lengths = jnp.asarray([4, 2], jnp.int32)
    seg = model.generate(variables, prompt, lengths, max_length=18,
                         sampler=BeamSampler(num_beams=3),
                         cache_policy="segmented", segment_len=4)
    mono = model.generate(variables, prompt, lengths, max_length=18,
                          sampler=BeamSampler(num_beams=3),
                          cache_policy="monolithic")
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(mono))


def test_beam_segmented_with_end_token(lm):
    """End-token early-stop semantics survive the segmented rewrite."""
    model, variables = lm
    prompt = jnp.asarray([[5, 9, 3]], jnp.int32)
    lengths = jnp.asarray([3], jnp.int32)
    kw = dict(max_length=16, sampler=BeamSampler(num_beams=2),
              end_token_id=1)
    seg = model.generate(variables, prompt, lengths,
                         cache_policy="segmented", segment_len=5, **kw)
    mono = model.generate(variables, prompt, lengths,
                          cache_policy="monolithic", **kw)
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(mono))


def test_contrastive_shared_context_matches_monolithic(lm):
    """The shared-context candidate forward (1-slot active cache +
    [B]-row read-only history) picks the same tokens as the monolithic
    repeat+select formulation."""
    model, variables = lm
    prompt = jnp.asarray([[5, 9, 3, 7], [11, 2, 0, 0]], jnp.int32)
    lengths = jnp.asarray([4, 2], jnp.int32)
    kw = dict(max_length=14, sampler=ContrastiveSampler(k=3, alpha=0.5))
    shared = model.generate(variables, prompt, lengths,
                            cache_policy="segmented", **kw)
    mono = model.generate(variables, prompt, lengths,
                          cache_policy="monolithic", **kw)
    np.testing.assert_array_equal(np.asarray(shared), np.asarray(mono))


def test_context_decode_matches_monolithic_forward(lm):
    """Unit check one level down: a single-token forward through the
    context-segment attention (split cache: read-only prefix + active
    suffix) returns the same logits as the monolithic cache forward."""
    model, variables = lm
    b, p, t = 2, 6, 10
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, 100, (b, p)), jnp.int32)
    caches = model.build_cache(b, t)
    positions = jnp.broadcast_to(jnp.arange(p)[None], (b, p))
    logits_p, caches = model.call_with_cache(
        variables, ids, caches, 0, positions)

    tok = jnp.asarray([[7], [9]], jnp.int32)
    pos = jnp.full((b, 1), p, jnp.int32)
    mono_logits, _ = model.call_with_cache(variables, tok, caches, p, pos)

    # split: prefix [0, 4) read-only, active holds [4, t)
    split = 4
    ctx = caches[:, :, :, :split]
    active = jnp.zeros(
        (b, model.config.num_layers, 2, t - split,
         model.config.num_kv_heads, model.config.head_dim), caches.dtype)
    active = jax.lax.dynamic_update_slice(
        active, caches[:, :, :, split:], (0, 0, 0, 0, 0, 0))
    seg_logits, _ = model.call_with_cache(
        variables, tok, active, p, pos,
        context=((ctx, 0),), cache_offset=split)
    np.testing.assert_allclose(np.asarray(mono_logits),
                               np.asarray(seg_logits), rtol=2e-5, atol=2e-5)
