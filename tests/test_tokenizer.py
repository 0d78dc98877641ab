"""Tokenizer + chat template tests with a synthetic SentencePiece proto."""

import functools

import pytest

from gemma_tpu.models.configs import PromptWrapping
from gemma_tpu.models.tokenizer import (
    BOS_ID,
    ChatTemplate,
    GemmaTokenizer,
    MOCK_TOKENIZER,
    wrap_and_tokenize,
)


@functools.lru_cache(maxsize=1)
def tiny_proto() -> bytes:
    """A minimal Gemma-style SPM proto: pad/eos/bos/unk + control tokens +
    byte-fallback pieces + a few word pieces (layout per GemmaConverter)."""
    from transformers.convert_slow_tokenizer import import_protobuf

    pb = import_protobuf()
    m = pb.ModelProto()
    ptype = pb.ModelProto.SentencePiece

    def add(piece, score=0.0, kind=ptype.NORMAL):
        p = m.pieces.add()
        p.piece = piece
        p.score = score
        p.type = kind

    add("<pad>", kind=ptype.CONTROL)
    add("<eos>", kind=ptype.CONTROL)
    add("<bos>", kind=ptype.CONTROL)
    add("<unk>", kind=ptype.UNKNOWN)
    for ctl in ("<start_of_turn>", "<end_of_turn>",
                "<start_of_image>", "<end_of_image>"):
        add(ctl, kind=ptype.CONTROL)
    for b in range(256):
        add(f"<0x{b:02X}>", kind=ptype.BYTE)
    words = ["▁hello", "▁world", "▁user", "▁model",
             "hello", "world", "▁", "\n", "user", "model"]
    for i, w in enumerate(words):
        add(w, score=-float(i + 1))
    m.trainer_spec.model_type = pb.TrainerSpec.UNIGRAM
    m.trainer_spec.vocab_size = len(m.pieces)
    m.trainer_spec.byte_fallback = True
    m.trainer_spec.unk_id = 3
    m.normalizer_spec.name = "identity"
    m.normalizer_spec.add_dummy_prefix = False
    m.normalizer_spec.escape_whitespaces = True
    return m.SerializeToString()


def test_mock_tokenizer():
    tok = GemmaTokenizer(MOCK_TOKENIZER)
    assert not tok.available
    assert tok.encode("hi") == []
    assert tok.serialize() == MOCK_TOKENIZER


def test_encode_decode_roundtrip():
    tok = GemmaTokenizer(tiny_proto())
    assert tok.available
    ids = tok.encode("hello world")
    assert ids, "non-empty encoding"
    assert tok.decode(ids) == "hello world"


def test_byte_fallback():
    tok = GemmaTokenizer(tiny_proto())
    ids = tok.encode("café")  # chars not in vocab -> byte pieces
    assert ids
    assert tok.decode(ids) == "café"


def test_control_tokens_single_id():
    tok = GemmaTokenizer(tiny_proto())
    ids = tok.encode("<start_of_turn>user\n")
    # control token must map to its single piece id (4), not be split
    assert ids[0] == 4


def test_chat_template_structure():
    tok = GemmaTokenizer(tiny_proto())
    tpl = ChatTemplate(tok)
    inner = tok.encode("hello")
    first = tpl.apply(0, inner)
    assert first[0] == BOS_ID
    assert first[1 : 1 + len(tpl.sot_user)] == tpl.sot_user
    assert first[-len(tpl.sot_model):] == tpl.sot_model
    cont = tpl.apply(7, inner)
    assert cont[: len(tpl.eot)] == tpl.eot


def test_wrap_and_tokenize_pt_vs_it():
    tok = GemmaTokenizer(tiny_proto())
    tpl = ChatTemplate(tok)
    pt = wrap_and_tokenize(tok, tpl, PromptWrapping.GEMMA_PT, 0, "hello")
    assert pt[0] == BOS_ID and pt[1:] == tok.encode("hello")
    pt2 = wrap_and_tokenize(tok, tpl, PromptWrapping.GEMMA_PT, 5, "hello")
    assert pt2 == tok.encode("hello")
    it = wrap_and_tokenize(tok, tpl, PromptWrapping.GEMMA_IT, 0, "hello")
    assert it == tpl.apply(0, tok.encode("hello"))


def test_wrap_vision():
    tok = GemmaTokenizer(tiny_proto())
    tpl = ChatTemplate(tok)
    pali = wrap_and_tokenize(tok, tpl, PromptWrapping.PALIGEMMA, 0, "hello",
                             image_batch_size=3)
    assert pali[:3] == [0, 0, 0] and pali[3] == BOS_ID
    vlm = wrap_and_tokenize(tok, tpl, PromptWrapping.GEMMA_VLM, 0, "hello",
                            image_batch_size=4)
    assert vlm.count(-2) == 4
