"""Exercise the Gemma tokenizer against a REAL trained subword vocabulary.

The image ships no SentencePiece proto, but HuggingFace ``tokenizers`` is
available — we train a genuine BPE subword vocab offline (Gemma special
tokens at the reference ids: <pad>=0 <eos>=1 <bos>=2, matching
``/root/reference/nlp/gemma/gemma_tokenizer.py``), save it as
``tokenizer.json`` (the fast-tokenizer export format Gemma publishes), and
drive the full GemmaTokenizer -> preprocessor -> GemmaCausalLM.score path.
"""

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")

from iseg_tpu.nlp.gemma.tokenizer import (  # noqa: E402
    GemmaCausalLMPreprocessor,
    GemmaTokenizer,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "segmentation models sample pixels with atrous convolutions",
    "tensor processing units multiply matrices in systolic arrays",
    "hello world hello tokenizer hello subwords",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
] * 8


@pytest.fixture(scope="module")
def vocab_path(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers, decoders

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    trainer = trainers.BpeTrainer(
        vocab_size=512,
        special_tokens=["<pad>", "<eos>", "<bos>", "<unk>"],  # ids 0,1,2,3
    )
    tok.train_from_iterator(CORPUS, trainer)
    path = tmp_path_factory.mktemp("vocab") / "tokenizer.json"
    tok.save(str(path))
    return str(path)


def test_special_token_ids_match_gemma_convention(vocab_path):
    tok = GemmaTokenizer(proto_path=vocab_path)
    assert tok.pad_id == 0
    assert tok.eos_id == 1
    assert tok.bos_id == 2


def test_roundtrip_real_vocab(vocab_path):
    tok = GemmaTokenizer(proto_path=vocab_path)
    text = "the quick brown fox"
    ids = tok.tokenize(text)
    assert len(ids) >= 2  # real subword segmentation, not chars-only
    assert all(isinstance(i, int) for i in ids)
    assert tok.detokenize(ids).strip() == text


def test_oov_segments_to_subwords_not_unk(vocab_path):
    tok = GemmaTokenizer(proto_path=vocab_path)
    # unseen word made of seen characters: BPE must back off to subwords
    ids = tok.tokenize("foxdog")
    assert len(ids) >= 2
    assert "foxdog" in tok.detokenize(ids)


def test_preprocessor_packs_real_ids(vocab_path):
    tok = GemmaTokenizer(proto_path=vocab_path)
    pre = GemmaCausalLMPreprocessor(tok, sequence_length=16)
    ids, lengths = pre(["hello world", "the lazy dog"])
    assert ids.shape == (2, 16)
    assert ids[0, 0] == tok.bos_id
    assert ids[0, lengths[0] - 1] == tok.eos_id
    assert (ids[0, lengths[0]:] == tok.pad_id).all()


def test_causal_lm_scores_real_tokens(vocab_path):
    import jax

    from iseg_tpu.nlp.gemma.causal_lm import GemmaCausalLM
    from iseg_tpu.nlp.gemma.config import get_preset

    tok = GemmaTokenizer(proto_path=vocab_path)
    pre = GemmaCausalLMPreprocessor(tok, sequence_length=12)
    ids, _ = pre(["hello world", "the quick brown fox"])

    lm = GemmaCausalLM(get_preset("gemma_test"))
    variables = lm.init(jax.random.PRNGKey(0), batch=2, seq=12)
    scores = lm.score(variables, ids)  # per-token log-likelihoods [B, L-1]
    assert scores.shape == (2, 11)
    assert np.isfinite(np.asarray(scores, np.float32)).all()


def test_for_training_next_token_pack(vocab_path):
    """Reference gemma_causal_lm_preprocessor.call semantics: inputs are
    tokens[:-1], targets tokens[1:], sample weight = padding mask."""
    tok = GemmaTokenizer(proto_path=vocab_path)
    pre = GemmaCausalLMPreprocessor(tok, sequence_length=10)
    x, y, sw = pre.for_training(["hello world"])
    assert x["token_ids"].shape == (1, 10)
    assert y.shape == (1, 10) and sw.shape == (1, 10)
    # target is the input shifted left by one while both are real tokens
    real = sw[0] & x["padding_mask"][0]
    np.testing.assert_array_equal(x["token_ids"][0, 1:][real[1:]],
                                  y[0, :-1][real[1:]])
    assert x["token_ids"][0, 0] == tok.bos_id


def test_generate_postprocess_roundtrip(vocab_path):
    tok = GemmaTokenizer(proto_path=vocab_path)
    pre = GemmaCausalLMPreprocessor(tok, sequence_length=12)
    ids, lengths = pre(["the quick brown fox"], for_generation=True)
    texts = pre.generate_postprocess(ids)
    assert texts[0].strip() == "the quick brown fox"
