"""Weights-required integration tests (maps evals/gemma_test.cc).

Skipped unless real weights are provided:

    GEMMA_WEIGHTS=/path/gemma2-2b-it-sfp.sbs \
    [GEMMA_TOKENIZER=/path/tokenizer.model] \
    [GEMMA_GOLDENS=/path/goldens/2b-it.txt] \
    python -m pytest tests/test_golden.py -v

Covers: batched QA substring checks (gemma_test.cc:74-97), multiturn
KV-cache reuse (:99-151), CrossEntropySmall with the published
expectations 2B=1.14+-0.02 / 9B=1.28 / 27B=1.30 bits/byte (:153-174), and
greedy-decode parity against `+++ prompt / --- expected` golden files.
"""

import os

import pytest

WEIGHTS = os.environ.get("GEMMA_WEIGHTS", "")
pytestmark = pytest.mark.skipif(
    not WEIGHTS, reason="set GEMMA_WEIGHTS to run weights-required tests")

# gemma_test.cc:74-97 batched QA (prompt, expected substring).
QA = [
    ("What is the capital of Spain?", "Madrid"),
    ("Who is the CEO of Tesla?", "Elon Musk"),
    ("How many states does the US have?", "50"),
    ("What is the Pacific?", "ocean"),
    ("When was the battle of Hastings?", "1066"),
    ("what is the physical formula for gravity?", "g"),
]

CE_SENTENCE = "The capital of Hungary is Budapest which is located in Europe."
CE_EXPECTED = {  # model enum name -> bits/byte (gemma_test.cc:161-169)
    "GEMMA2_2B": (1.14, 0.02),
    "GEMMA2_9B": (1.28, 0.02),
    "GEMMA2_27B": (1.30, 0.02),
}


@pytest.fixture(scope="module")
def env():
    from gemma_tpu.evals.benchmark_helper import GemmaEnv
    from gemma_tpu.gemma import Gemma

    gemma = Gemma.load(
        WEIGHTS, tokenizer_path=os.environ.get("GEMMA_TOKENIZER") or None)
    gemma.runtime.max_generated_tokens = 64
    return GemmaEnv(gemma)


def test_batched_qa(env):
    results = env.batch_query_model([q for q, _ in QA],
                                    max_generated_tokens=48)
    hits = sum(1 for (q, a), r in zip(QA, results)
               if a.lower() in r.response.lower())
    assert hits >= len(QA) - 1, [r.response for r in results]


def test_multiturn_cache_reuse(env):
    g = env.gemma
    cache = g.new_cache(1, g.runtime.seq_len)
    ids1 = env.wrap_and_tokenize("My name is Rob. Please remember that.")
    out1 = g.generate(ids1, cache=cache, max_generated_tokens=32)
    pos = len(ids1) + len(out1) - 1
    ids2 = env.wrap_and_tokenize("What is my name?", pos=pos)
    out2 = g.generate(ids2, cache=cache, start_pos=pos,
                      max_generated_tokens=32)
    text = env.string_from_tokens(
        [t for t in out2 if not g.config.is_eos(t)])
    assert "Rob" in text, text


def test_cross_entropy_small(env):
    name = env.gemma.config.model.name
    if name not in CE_EXPECTED:
        pytest.skip(f"no CE expectation for {name}")
    bits = env.cross_entropy(CE_SENTENCE)
    want, tol = CE_EXPECTED[name]
    assert bits == pytest.approx(want, abs=tol), bits


def parse_goldens(path):
    """`+++ prompt` / `--- expected-substring` pairs (goldens/2b-it.txt)."""
    pairs = []
    prompt = None
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("+++ "):
                prompt = line[4:]
            elif line.startswith("--- ") and prompt is not None:
                pairs.append((prompt, line[4:]))
                prompt = None
    return pairs


@pytest.mark.skipif(not os.environ.get("GEMMA_GOLDENS"),
                    reason="set GEMMA_GOLDENS for transcript parity")
def test_golden_transcripts(env):
    pairs = parse_goldens(os.environ["GEMMA_GOLDENS"])
    assert pairs, "no golden pairs parsed"
    misses = []
    for prompt, expected in pairs:
        result = env.query_model(prompt, max_generated_tokens=96)
        if expected.lower() not in result.response.lower():
            misses.append((prompt, expected, result.response))
    # Greedy decode should reproduce the goldens; allow 1 tolerance for
    # tokenizer-backend drift.
    assert len(misses) <= 1, misses
