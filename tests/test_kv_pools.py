"""Windowed KV pools: two-pool cache must match the single-pool oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from gemma_tpu.engine.engine import GemmaEngine, RuntimeConfig
from gemma_tpu.models.kv_cache import KVCache

from tests.test_model import random_weights, tiny_config, to_params


@pytest.fixture(scope="module")
def setup():
    # Mixed windows: layer 0 local (window 8), layer 1 global (seq 64).
    config = tiny_config(num_layers=2)
    config.max_seq_len = 64
    config.attention_window_sizes = [8, 64]
    rng = np.random.default_rng(5)
    params = to_params(random_weights(config, rng), config)
    return config, params


def test_pool_split_and_shapes(setup):
    config, _ = setup
    cache = KVCache.create(config, 2, 64, local_slack=16)
    assert cache.kv_local is not None
    assert cache.layer_map == ((True, 0), (False, 0))
    assert cache.seq_len_local == 8 + 16
    assert cache.kv.shape[1] == 1 and cache.kv_local.shape[1] == 1
    # Memory: local pool rows 24+pad vs 64+pad.  Both round up to the
    # 128-row allocation tile (the S-blocked decode kernel's lane-legal
    # panel unit), so at this TOY scale they tie; at real windows
    # (1024/4096 vs 32K seq) the local pools stay ~window-sized.
    assert cache.kv_local.shape[4] <= cache.kv.shape[4]

    single = KVCache.create(config, 2, 64, split_local=False)
    assert single.kv_local is None
    assert single.kv.shape[1] == 2


def test_pooled_generation_matches_single_pool(setup):
    config, params = setup
    rng = np.random.default_rng(6)
    # Prompts long enough to wrap the local ring several times (>24 rows).
    prompts = [list(rng.integers(2, 100, n)) for n in (40, 55)]

    def run(split_local):
        eng = GemmaEngine(params, config,
                          RuntimeConfig(seq_len=64, prefill_tbatch_size=16,
                                        decode_chunk=3))
        cache = KVCache.create(config, len(prompts), 64,
                               split_local=split_local, local_slack=16)
        return eng.generate_batch(prompts, max_generated_tokens=6,
                                  cache=cache)

    want = run(False)
    got = run(True)
    assert got == want


def test_pool_copy_and_assign(setup):
    config, _ = setup
    a = KVCache.create(config, 1, 64, local_slack=16)
    b = a.copy()
    assert b.kv_local is not None and b.layer_map == a.layer_map
    c = KVCache.create(config, 1, 64, local_slack=16)
    c.assign(b)
    assert c.kv is b.kv and c.kv_local is b.kv_local


def test_prefill_chunk_exceeding_slack_raises(setup):
    config, params = setup
    eng = GemmaEngine(params, config,
                      RuntimeConfig(seq_len=64, prefill_tbatch_size=32))
    cache = KVCache.create(config, 1, 64, local_slack=16)
    with pytest.raises(ValueError, match="local KV ring slack"):
        eng.prefill([[2] * 40], cache)


def test_pooled_cache_on_mesh():
    """Windowed pools shard and run through the TP step."""
    from gemma_tpu.parallel import (build_tp_step, make_mesh, shard_cache,
                                    shard_params)
    from gemma_tpu.utils.synth import synth_params
    from gemma_tpu.models.gemma import forward
    from tests.test_parallel import tp_config

    config = tp_config(num_layers=2)
    config.attention_window_sizes = [8, 64]
    params = synth_params(config, kind="f32", seed=9)
    batch, t, seq = 4, 8, 64
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, config.vocab_size, (batch, t)).astype(np.int32)
    positions = np.tile(np.arange(t, dtype=np.int32), (batch, 1))
    valid = np.ones((batch, t), bool)
    pe = np.zeros((batch,), np.int32)

    ref_cache = KVCache.create(config, batch, seq, local_slack=16)
    ref_logits, _ = forward(params, jnp.asarray(tokens),
                            jnp.asarray(positions), ref_cache, config,
                            return_logits="last", valid=jnp.asarray(valid))

    mesh = make_mesh(8, config)
    p_sh = shard_params(params, config, mesh)
    cache = shard_cache(KVCache.create(config, batch, seq, local_slack=16),
                        mesh)
    assert cache.kv_local is not None
    step = build_tp_step(p_sh, config, mesh, return_logits="last")
    tp_logits, tp_cache = step(p_sh, jnp.asarray(tokens),
                               jnp.asarray(positions), jnp.asarray(valid),
                               jnp.asarray(pe), cache)
    assert tp_cache.kv_local is not None
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


def test_engine_sizes_local_ring_for_prefix(setup):
    """ADVICE r1 (high): PaliGemma2-shaped prompts (local-window layers +
    prefix-LM) must not raise at default settings — generate_batch sizes the
    local ring for the widened chunk, or falls back to one pool."""
    from gemma_tpu.models.configs import PromptWrapping
    from tests.test_model import random_weights, tiny_config, to_params

    config = tiny_config(num_layers=2)
    config.max_seq_len = 512
    config.attention_window_sizes = [8, 512]
    rng = np.random.default_rng(11)
    params = to_params(random_weights(config, rng), config)
    engine = GemmaEngine(params, config,
                         RuntimeConfig(seq_len=512, prefill_tbatch_size=16))

    # Default engine cache still splits (slack >= LOCAL_RING_SLACK).
    c = engine.new_cache(1)
    assert c.kv_local is not None and c.local_slack >= 256

    # Explicit min_local_slack grows the ring.
    c2 = engine.new_cache(1, min_local_slack=300)
    assert c2.kv_local is not None and c2.seq_len_local >= 8 + 300

    # Slack that leaves no room to split -> single-pool fallback.
    c3 = engine.new_cache(1, min_local_slack=600)
    assert c3.kv_local is None

    # End-to-end: a prefix wider than the default slack (the repro that
    # raised ValueError in round 1).
    prompt = [int(t) for t in rng.integers(2, 100, 301)]
    out = engine.generate(prompt, max_generated_tokens=2, prefix_end=301)
    assert len(out) == 2

    # PALIGEMMA wrapping never splits (unbounded image+text prefix).
    config.wrapping = PromptWrapping.PALIGEMMA
    engine_p = GemmaEngine(params, config, RuntimeConfig(seq_len=512))
    assert engine_p.new_cache(1).kv_local is None
