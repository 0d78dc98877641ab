"""Continuous batching scheduler vs one-at-a-time generation."""

import numpy as np
import pytest

from gemma_tpu.engine.engine import GemmaEngine, RuntimeConfig
from gemma_tpu.engine.serving import ContinuousBatcher, Request

from tests.test_model import random_weights, tiny_config, to_params


@pytest.fixture(scope="module")
def engine():
    rng = np.random.default_rng(0)
    config = tiny_config(num_layers=2)
    config.eos_id = -1  # random model: disable accidental EOS retirement
    config.secondary_eos_id = -1
    params = to_params(random_weights(config, rng), config)
    return GemmaEngine(params, config,
                       RuntimeConfig(seq_len=48, prefill_tbatch_size=8,
                                     decode_qbatch_size=2))


def test_continuous_matches_individual(engine):
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(2, 100, n)) for n in (3, 5, 7, 4, 6)]
    max_tokens = 6

    # Oracle: each prompt generated alone (greedy).
    want = [engine.generate(p, max_generated_tokens=max_tokens)
            for p in prompts]

    # 2-slot continuous batcher over 5 requests.
    batcher = ContinuousBatcher(engine, slots=2, seq_len=48)
    reqs = [batcher.submit(Request(p, max_tokens=max_tokens))
            for p in prompts]
    batcher.run_until_idle()

    assert all(r.done for r in reqs)
    assert [r.output for r in reqs] == want


def test_streaming_and_early_stop(engine):
    batcher = ContinuousBatcher(engine, slots=2, seq_len=48)
    seen = []

    def on_token(req, tok):
        seen.append((req.request_id, tok))
        return len([t for r, t in seen if r == req.request_id]) < 2

    req = batcher.submit(Request([2, 5, 9], max_tokens=10,
                                 on_token=on_token))
    batcher.run_until_idle()
    assert req.done
    assert len(req.output) == 2  # stopped by callback


def test_slot_reuse_no_leak(engine):
    """A long request decoding while short ones cycle through the other
    slot must not be corrupted by slot reuse (ring-mask isolation)."""
    rng = np.random.default_rng(2)
    long_prompt = list(rng.integers(2, 100, 8))
    want = engine.generate(long_prompt, max_generated_tokens=10)

    batcher = ContinuousBatcher(engine, slots=2, seq_len=48)
    long_req = batcher.submit(Request(long_prompt, max_tokens=10))
    for n in (3, 4, 5, 3):
        batcher.submit(Request(list(rng.integers(2, 100, n)), max_tokens=2))
    batcher.run_until_idle()
    assert long_req.output == want
