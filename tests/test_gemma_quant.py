"""int8 weight-only quantization for Gemma serving (nlp.gemma.quant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iseg_tpu.nlp.gemma.causal_lm import GemmaCausalLM
from iseg_tpu.nlp.gemma.config import get_preset
from iseg_tpu.nlp.gemma.quant import (
    QTensor,
    dequantize_tree,
    is_quantized,
    quantize_tree,
)


@pytest.fixture(scope="module")
def lm_and_vars():
    lm = GemmaCausalLM(get_preset("gemma_test"))
    variables = lm.init(jax.random.PRNGKey(0), batch=2, seq=8)
    return lm, variables


def test_quantize_structure_and_error(lm_and_vars):
    _, variables = lm_and_vars
    q = quantize_tree(variables["params"], min_size=256)
    assert is_quantized(q)
    assert not is_quantized(variables["params"])

    flat_q = jax.tree_util.tree_leaves(
        q, is_leaf=lambda x: isinstance(x, QTensor))
    n_qt = sum(isinstance(x, QTensor) for x in flat_q)
    assert n_qt > 0
    for leaf in flat_q:
        if isinstance(leaf, QTensor):
            assert leaf.q.dtype == jnp.int8
            assert leaf.scale.shape == leaf.q.shape[-1:]

    dense = dequantize_tree(q, dtype=jnp.float32)
    # quantization and dequantization share the bf16-rounded scale, so the
    # per-element error is at most half a (bf16-rounded) quantization step
    for orig, deq in zip(jax.tree_util.tree_leaves(variables["params"]),
                         jax.tree_util.tree_leaves(dense)):
        orig = np.asarray(orig, np.float32)
        deq = np.asarray(deq, np.float32)
        if orig.ndim >= 2 and orig.size >= 256:
            step = np.abs(orig).max(
                axis=tuple(range(orig.ndim - 1)), keepdims=True) / 127.0
            bound = step * (1.0 + 2.0 ** -8) * 0.51 + 1e-7
            assert (np.abs(orig - deq) <= bound).all()


def test_score_close_to_dense(lm_and_vars):
    lm, variables = lm_and_vars
    ids = jnp.asarray(
        np.random.RandomState(0).randint(1, 512, (2, 8)), jnp.int32)
    full = np.asarray(lm.score(variables, ids), np.float32)
    qvars = {"params": quantize_tree(variables["params"], min_size=256)}
    quant = np.asarray(lm.score(qvars, ids), np.float32)
    assert np.isfinite(quant).all()
    # int8 weight-only keeps per-token log-likelihoods close
    assert np.abs(full - quant).max() < 0.15


def test_generate_with_quantized_params(lm_and_vars):
    lm, variables = lm_and_vars
    prompt = jnp.asarray([[2, 5, 9, 4]], jnp.int32)
    lengths = jnp.asarray([4], jnp.int32)
    qvars = {"params": quantize_tree(variables["params"], min_size=256)}

    out_q = lm.generate(qvars, prompt, lengths, max_length=12)
    assert out_q.shape == (1, 12)
    np.testing.assert_array_equal(np.asarray(out_q[0, :4]),
                                  np.asarray(prompt[0]))

    # greedy decode with explicitly-dequantized params must match exactly:
    # the lazy in-scan dequant is numerically identical, only laid out
    # differently in HBM
    dense_vars = {"params": dequantize_tree(qvars["params"],
                                            dtype=jnp.float32)}
    out_d = lm.generate(dense_vars, prompt, lengths, max_length=12)
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_d))


def test_w8a8_score_close_and_generate(lm_and_vars):
    """W8A8: int8-resident kernels (QuantDense switches on kernel dtype)
    with dynamic per-row activation scales."""
    from iseg_tpu.ops.quant import quantize_dense_tree

    lm, variables = lm_and_vars
    qvars = {"params": quantize_dense_tree(variables["params"])}

    # every QuantDense kernel is now int8 with a real scale
    import flax
    flat = flax.traverse_util.flatten_dict(qvars["params"])
    n_int8 = sum(1 for path, leaf in flat.items()
                 if path[-1] == "kernel" and leaf.dtype == jnp.int8)
    assert n_int8 == 2 * 7  # 7 projections per layer, 2 layers
    emb = qvars["params"]["token_embedding"]
    assert emb["embedding"].dtype == jnp.int8  # tied table int8 too

    ids = jnp.asarray(
        np.random.RandomState(0).randint(1, 512, (2, 8)), jnp.int32)
    full = np.asarray(lm.score(variables, ids), np.float32)
    quant = np.asarray(lm.score(qvars, ids), np.float32)
    assert np.isfinite(quant).all()
    assert np.abs(full - quant).max() < 0.35  # W8A8 noise, still close

    prompt = jnp.asarray([[2, 5, 9, 4]], jnp.int32)
    out = lm.generate(qvars, prompt, jnp.asarray([4], jnp.int32),
                      max_length=12)
    assert out.shape == (1, 12)
    np.testing.assert_array_equal(np.asarray(out[0, :4]),
                                  np.asarray(prompt[0]))


def test_quant_dense_unquantized_matches_ones_scale():
    """With the all-ones scale, QuantDense must equal a plain dense
    contraction exactly (multiply by 1.0 is exact)."""
    from iseg_tpu.ops.quant import QuantDense

    x = jnp.asarray(np.random.RandomState(0).rand(3, 5, 16), jnp.float32)
    layer = QuantDense((4, 8), axis=-1)
    variables = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(variables, x)
    w = variables["params"]["kernel"]
    want = jnp.einsum("bti,ihd->bthd", x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
