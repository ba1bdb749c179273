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
