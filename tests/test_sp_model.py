"""SentencePiece ModelProto path (VERDICT r2 #6): wire-format roundtrip,
unigram Viterbi / BPE encode semantics, byte fallback, and the real-vocab
test matrix driven through a ``.model`` proto on disk (reference tokenizer
is SentencePiece-proto based, nlp/gemma/gemma_tokenizer.py:23)."""

import json

import numpy as np
import pytest

from iseg_tpu.nlp.gemma.sp_model import (
    BYTE,
    CONTROL,
    NORMAL,
    UNKNOWN,
    SentencePiece,
    SentencePieceModel,
    SPModelProto,
    build_byte_pieces,
    parse_model_proto,
    serialize_model_proto,
)
from iseg_tpu.nlp.gemma.tokenizer import (
    GemmaCausalLMPreprocessor,
    GemmaTokenizer,
)

WS = "▁"


def _gemma_specials():
    return [
        SentencePiece("<pad>", 0.0, CONTROL),
        SentencePiece("<eos>", 0.0, CONTROL),
        SentencePiece("<bos>", 0.0, CONTROL),
        SentencePiece("<unk>", 0.0, UNKNOWN),
    ]


def _unigram_proto(extra_pieces, **kwargs):
    return SPModelProto(
        pieces=_gemma_specials() + extra_pieces,
        model_type=1,
        pad_id=0, eos_id=1, bos_id=2, unk_id=3,
        **kwargs,
    )


def test_proto_serialize_parse_roundtrip():
    proto = SPModelProto(
        pieces=[
            SentencePiece("<unk>", 0.0, UNKNOWN),
            SentencePiece(WS + "hi", -1.5, NORMAL),
            SentencePiece("<0xAB>", -10.0, BYTE),
        ],
        model_type=2,
        unk_id=0, bos_id=1, eos_id=2, pad_id=-1,  # TrainerSpec defaults
        byte_fallback=True,
        add_dummy_prefix=False,
        remove_extra_whitespaces=False,
        escape_whitespaces=True,
    )
    back = parse_model_proto(serialize_model_proto(proto))
    assert [(p.piece, p.type) for p in back.pieces] == [
        ("<unk>", UNKNOWN), (WS + "hi", NORMAL), ("<0xAB>", BYTE)]
    assert abs(back.pieces[1].score - -1.5) < 1e-6
    assert back.model_type == 2
    assert back.pad_id == -1  # negative int32 survives varint encoding
    assert back.byte_fallback is True
    assert back.add_dummy_prefix is False
    assert back.remove_extra_whitespaces is False
    assert back.escape_whitespaces is True


def test_unigram_viterbi_picks_max_score_segmentation():
    """'hello' can be [▁hello] (-1.0) or [▁hel][lo] (-0.3 + -0.4 = -0.7):
    Viterbi must take the higher-scoring split, not the longest match."""
    proto = _unigram_proto([
        SentencePiece(WS + "hello", -1.0),
        SentencePiece(WS + "hel", -0.3),
        SentencePiece("lo", -0.4),
    ])
    m = SentencePieceModel(proto)
    ids = m.encode("hello")
    assert [m.id_to_piece(i) for i in ids] == [WS + "hel", "lo"]
    # flip the preference: whole word now cheaper
    proto.pieces[4].score = -0.5
    m2 = SentencePieceModel(proto)
    assert [m2.id_to_piece(i) for i in m2.encode("hello")] == [WS + "hello"]


def test_unigram_unk_fallback_and_decode():
    proto = _unigram_proto([
        SentencePiece(WS + "a", -0.5),
        SentencePiece("b", -0.5),
    ])
    m = SentencePieceModel(proto)
    ids = m.encode("ab!b")  # '!' has no piece -> unk
    assert m.unk_id() in ids
    # decode renders unk as sentencepiece's DefaultUnknownSurface " ⁇ "
    # (the native backend does the same; dropping it would make the two
    # backends round-trip to different text)
    assert m.decode(ids) == "ab ⁇ b"


def test_empty_and_whitespace_encode_to_nothing():
    # sentencepiece encodes "" (and whitespace-only when
    # remove_extra_whitespaces trims it) to [] — the dummy prefix must
    # not turn empty input into one whitespace token
    proto = _unigram_proto([SentencePiece(WS + "a", -0.5)])
    m = SentencePieceModel(proto)
    assert m.encode("") == []
    assert m.encode("   ") == []
    no_trim = SentencePieceModel(_unigram_proto(
        [SentencePiece(WS + "a", -0.5)], remove_extra_whitespaces=False))
    assert no_trim.encode("") == []
    assert no_trim.encode(" ") != []  # preserved when trimming is off


def test_byte_fallback_roundtrip_exact():
    proto = _unigram_proto(
        [SentencePiece(WS + "ok", -0.5)] + build_byte_pieces(-20.0),
        byte_fallback=True,
    )
    m = SentencePieceModel(proto)
    text = "ok é世"  # é and 世 only reachable through byte pieces
    ids = m.encode(text)
    assert m.unk_id() not in ids
    assert m.decode(ids) == text  # bytes reassemble to exact utf-8


def test_bpe_merge_order_follows_scores():
    """BPE merges the best-scoring adjacent pair first: with ('ab', -1)
    better than ('bc', -2), 'abc' -> [ab][c], not [a][bc]."""
    proto = SPModelProto(
        pieces=_gemma_specials() + [
            SentencePiece("a", -10.0), SentencePiece("b", -10.0),
            SentencePiece("c", -10.0),
            SentencePiece("ab", -1.0), SentencePiece("bc", -2.0),
        ],
        model_type=2, pad_id=0, eos_id=1, bos_id=2, unk_id=3,
        add_dummy_prefix=False,
    )
    m = SentencePieceModel(proto)
    assert [m.id_to_piece(i) for i in m.encode("abc")] == ["ab", "c"]


def test_normalizer_flags():
    pieces = [SentencePiece(c, -1.0) for c in ("a", "b", WS)]
    base = dict(pad_id=0, eos_id=1, bos_id=2, unk_id=3, model_type=1)
    with_prefix = SentencePieceModel(SPModelProto(
        pieces=_gemma_specials() + pieces, add_dummy_prefix=True, **base))
    ids = with_prefix.encode("ab")
    assert with_prefix.id_to_piece(ids[0]) == WS
    no_prefix = SentencePieceModel(SPModelProto(
        pieces=_gemma_specials() + pieces, add_dummy_prefix=False, **base))
    assert no_prefix.id_to_piece(no_prefix.encode("ab")[0]) == "a"
    # extra whitespace collapse
    assert with_prefix.decode(with_prefix.encode("a    b")) == "a b"


# -- real trained vocabulary through a .model file on disk ------------------

tokenizers = pytest.importorskip("tokenizers")

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "segmentation models sample pixels with atrous convolutions",
    "tensor processing units multiply matrices in systolic arrays",
    "hello world hello tokenizer hello subwords",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
] * 8


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    """Train a REAL subword vocab (HF tokenizers BPE over the corpus), then
    convert it into a SentencePiece ModelProto: unigram pieces scored by
    training rank (earlier merges = more frequent = higher score), Gemma
    special ids <pad>=0 <eos>=1 <bos>=2, byte fallback on."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    trainer = trainers.BpeTrainer(
        vocab_size=512,
        special_tokens=["<pad>", "<eos>", "<bos>", "<unk>"],
    )
    tok.train_from_iterator(CORPUS, trainer)

    vocab = json.loads(tok.to_str())["model"]["vocab"]  # token -> id
    pieces = list(_gemma_specials())
    for token, tid in sorted(vocab.items(), key=lambda kv: kv[1]):
        if token in ("<pad>", "<eos>", "<bos>", "<unk>"):
            continue
        # unigram-style log-prob scores: every piece costs, single chars
        # cost the most (rare standalone), trained merges break ties by
        # rank — so Viterbi prefers fewer, longer, earlier-trained pieces
        score = (-9.5 - 0.001 * tid) if len(token) == 1 else (-2.0 - 0.001 * tid)
        pieces.append(SentencePiece(token, score, NORMAL))
    proto = SPModelProto(
        pieces=pieces + build_byte_pieces(-100.0),
        model_type=1, pad_id=0, eos_id=1, bos_id=2, unk_id=3,
        byte_fallback=True,
    )
    path = tmp_path_factory.mktemp("sp") / "tokenizer.model"
    path.write_bytes(serialize_model_proto(proto))
    return str(path)


def test_sp_special_token_ids_match_gemma_convention(model_path):
    tok = GemmaTokenizer(proto_path=model_path)
    assert tok.pad_id == 0
    assert tok.eos_id == 1
    assert tok.bos_id == 2


def test_sp_roundtrip_real_vocab(model_path):
    tok = GemmaTokenizer(proto_path=model_path)
    text = "the quick brown fox"
    ids = tok.tokenize(text)
    assert 2 <= len(ids) < len(text)  # real subwords, not chars-only
    assert tok.detokenize(ids) == text


def test_sp_oov_segments_to_subwords_not_unk(model_path):
    tok = GemmaTokenizer(proto_path=model_path)
    ids = tok.tokenize("foxdog")
    assert len(ids) >= 2
    assert "foxdog" in tok.detokenize(ids)


def test_sp_unseen_unicode_roundtrips_via_bytes(model_path):
    tok = GemmaTokenizer(proto_path=model_path)
    text = "the café"
    assert tok.detokenize(tok.tokenize(text)) == text


def test_sp_preprocessor_packs_real_ids(model_path):
    tok = GemmaTokenizer(proto_path=model_path)
    pre = GemmaCausalLMPreprocessor(tok, sequence_length=16)
    ids, lengths = pre(["hello world", "the lazy dog"])
    assert ids.shape == (2, 16)
    assert ids[0, 0] == tok.bos_id
    assert ids[0, lengths[0] - 1] == tok.eos_id
    assert (ids[0, lengths[0]:] == tok.pad_id).all()


def test_sp_generate_postprocess_roundtrip(model_path):
    tok = GemmaTokenizer(proto_path=model_path)
    pre = GemmaCausalLMPreprocessor(tok, sequence_length=12)
    ids, _ = pre(["the quick brown fox"], for_generation=True)
    texts = pre.generate_postprocess(ids)
    assert texts[0].strip() == "the quick brown fox"


def test_sp_matches_hf_fast_backend_on_corpus(model_path):
    """Cross-backend consistency: both backends must detokenize their own
    tokenization back to the same text for every corpus sentence."""
    tok = GemmaTokenizer(proto_path=model_path)
    for text in set(CORPUS):
        assert tok.detokenize(tok.tokenize(text)) == text
