"""GemmaContext bindings + cache write-back regression tests."""

import numpy as np
import pytest

from gemma_tpu.bindings.context import GemmaContext
from gemma_tpu.gemma import Gemma

from tests.test_frontends import tiny_model_file


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    path = tiny_model_file(tmp_path_factory.mktemp("model"))
    g = Gemma.load(path)
    g.runtime.seq_len = 64
    g.runtime.max_generated_tokens = 4
    g.runtime.prefill_tbatch_size = 16
    return GemmaContext(g)


def test_cache_writeback(ctx):
    """engine.generate must leave the caller-held cache updated."""
    g = ctx.gemma
    cache = g.new_cache(1, 64)
    before = np.asarray(cache.kv).copy()
    g.generate([2, 5, 7, 9], max_generated_tokens=2, cache=cache)
    after = np.asarray(cache.kv)
    assert not np.array_equal(before, after), "cache must reflect generation"


def test_multiturn_cache_continuation(ctx):
    """Turn 2 with a reused cache == decoding the concatenated sequence."""
    g = ctx.gemma
    t1 = [2, 5, 7]
    out1_tokens = g.generate(t1, max_generated_tokens=2)

    # Multiturn: reuse cache, continue at pos len(t1)+len(out1)-1 (rewind 1).
    cache = g.new_cache(1, 64)
    g.generate(t1, max_generated_tokens=2, cache=cache)
    t2 = [11, 13]
    pos = len(t1) + len(out1_tokens) - 1
    out2 = g.generate(t2, max_generated_tokens=2, cache=cache, start_pos=pos)

    # One-shot oracle: the last generated token never enters the KV cache
    # and is dropped between turns (run.cc:234-247), so the continuation
    # sees t1 + out1[:-1] + t2.
    out_ref = g.generate(t1 + out1_tokens[:-1] + t2, max_generated_tokens=2)
    assert out2 == out_ref


def test_conversation_management(ctx):
    assert ctx.current_conversation() == "default"
    assert ctx.create_conversation("side")
    assert not ctx.create_conversation("side")
    assert ctx.has_conversation("side")
    assert ctx.switch_conversation("side")
    assert ctx.current_conversation() == "side"
    assert ctx.delete_conversation("side")
    assert ctx.current_conversation() == "default"
    assert not ctx.switch_conversation("missing")
    assert not ctx.delete_conversation("default")


def test_generate_and_reset(ctx):
    ctx.set_multiturn(1)
    ctx.set_max_generated_tokens(3)
    text1 = ctx.generate("hello")
    assert isinstance(text1, str)
    pos_after = ctx.active.abs_pos
    assert pos_after > 0

    ctx.save_conversation()
    saved_kv = np.asarray(ctx.active.cache.kv).copy()
    ctx.generate("world")
    assert ctx.active.abs_pos > pos_after

    ctx.reset_conversation()
    assert ctx.active.abs_pos == pos_after
    np.testing.assert_array_equal(np.asarray(ctx.active.cache.kv), saved_kv)

    logs = []
    GemmaContext.set_log_callback(logs.append)
    ctx.reset_conversation()
    assert logs
    GemmaContext.set_log_callback(None)


def test_count_tokens(ctx):
    assert ctx.count_tokens("hello world") >= 2
