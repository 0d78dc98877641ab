"""GemmaModel (python/gemma_py.cc parity veneer) tests."""

import pytest

from gemma_tpu.gemma_py import GemmaModel

from tests.test_frontends import tiny_model_file


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tiny_model_file(tmp_path_factory.mktemp("model"))
    m = GemmaModel("", path, max_generated_tokens=4, seq_len=64)
    m._gemma.runtime.prefill_tbatch_size = 16
    return m


def test_generate(model):
    text = model.generate("hello", max_generated_tokens=3)
    assert isinstance(text, str)


def test_generate_ex_streaming_and_accept(model):
    seen = []
    out = model.generate_ex(
        "hello", stream=lambda tok, prob: (seen.append(tok), True)[1],
        max_generated_tokens=3)
    assert len(seen) >= len(out)  # stream sees prompt + generated

    allowed = set(model.tokenize("hello world") + [1])
    out = model.generate_ex("hello", accept=lambda t, l: t in allowed,
                            max_generated_tokens=2)
    assert all(t in allowed or model._gemma.config.is_eos(t) for t in out)


def test_generate_batch(model):
    outs = model.generate_batch(["hello", "world"], max_generated_tokens=2)
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)


def test_tokenize_roundtrip(model):
    ids = model.tokenize("hello world")
    assert model.detokenize(ids) == "hello world"


def test_cross_entropy(model):
    bits = model.cross_entropy("hello world")
    assert bits > 0.0
