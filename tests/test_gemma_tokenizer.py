import numpy as np
import pytest

from iseg_tpu.nlp.gemma.tokenizer import GemmaCausalLMPreprocessor, GemmaTokenizer


class StubBackend:
    """word-index stub standing in for SentencePiece."""

    VOCAB = {"hello": 10, "world": 11, "foo": 12}

    def encode(self, text):
        return [self.VOCAB.get(w, 9) for w in text.split()]

    def decode(self, ids):
        inv = {v: k for k, v in self.VOCAB.items()}
        return " ".join(inv.get(i, "<unk>") for i in ids)

    def pad_id(self):
        return 0

    def bos_id(self):
        return 2

    def eos_id(self):
        return 1


def test_tokenizer_requires_backend():
    tok = GemmaTokenizer()
    with pytest.raises(RuntimeError):
        tok.tokenize("hi")


def test_pad_id_never_negative():
    # a proto trained with pad disabled reports pad_id() == -1 (the
    # SentencePiece TrainerSpec default); -1 ids fed to the model would
    # silently embed row 0 via take()'s clipping, so the tokenizer clamps
    class NoPadBackend(StubBackend):
        def pad_id(self):
            return -1

    tok = GemmaTokenizer(backend=NoPadBackend())
    assert tok.pad_id == 0
    pre = GemmaCausalLMPreprocessor(tok, sequence_length=6)
    ids, lengths = pre(["hello world"])
    assert (ids >= 0).all()


def test_unknown_tokenizer_file_type_is_a_clear_error():
    from iseg_tpu.nlp.gemma.tokenizer import _load_backend

    with pytest.raises(ValueError, match="unsupported tokenizer file"):
        _load_backend("vocab.txt")


def test_tokenize_roundtrip_with_stub():
    tok = GemmaTokenizer(backend=StubBackend())
    ids = tok.tokenize("hello world")
    assert ids == [10, 11]
    assert tok.detokenize(ids) == "hello world"


def test_preprocessor_packing():
    tok = GemmaTokenizer(backend=StubBackend())
    pre = GemmaCausalLMPreprocessor(tok, sequence_length=6)
    ids, lengths = pre(["hello world", "foo"])
    np.testing.assert_array_equal(ids[0], [2, 10, 11, 1, 0, 0])
    np.testing.assert_array_equal(ids[1], [2, 12, 1, 0, 0, 0])
    np.testing.assert_array_equal(lengths, [4, 3])

    gen_ids, gen_len = pre(["hello world"], for_generation=True)
    np.testing.assert_array_equal(gen_ids[0], [2, 10, 11, 0, 0, 0])
    assert gen_len[0] == 3  # no eos when generating


def test_preprocessor_truncation():
    tok = GemmaTokenizer(backend=StubBackend())
    pre = GemmaCausalLMPreprocessor(tok, sequence_length=3)
    ids, lengths = pre(["hello world foo hello"])
    assert ids.shape == (1, 3)
    assert lengths[0] == 3
