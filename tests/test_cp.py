"""Context-parallel decode (parallel/cp.py) vs the single-device path.

The oracle is the dense models/gemma.py forward: CP shards the global
pools' ring dim over 8 virtual devices and must reproduce the dense
decode step from an identical prefilled cache.  Tolerances follow
tests/test_sp.py's measured analysis: the written layer-0 K/V row is
bit-strict (bit-identical GEMMs on bit-identical inputs; the sharded
write path is the thing under test), while logits after deeper layers
are bounded by the bf16 activation-rounding cliff that amplifies the
~1e-6 online-merge reorder."""

import jax.numpy as jnp
import numpy as np
import pytest

from gemma_tpu.compression import Type
from gemma_tpu.models.configs import (
    LayerConfig,
    Model,
    ModelConfig,
    PostNormType,
    QueryScaleType,
)
from gemma_tpu.models.gemma import forward
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.parallel.cp import build_cp_decode, shard_cache_cp
from gemma_tpu.parallel.mesh import make_mesh
from gemma_tpu.utils.synth import synth_params


def cp_config(windows):
    model_dim, heads, kv_heads, qkv_dim, ff = 64, 4, 2, 32, 128
    lc = LayerConfig(
        model_dim=model_dim,
        ff_hidden_dim=ff,
        heads=heads,
        kv_heads=kv_heads,
        qkv_dim=qkv_dim,
        post_norm=PostNormType.SCALE,
    )
    c = ModelConfig(
        model=Model.GEMMA2_2B,
        model_dim=model_dim,
        vocab_size=256,
        max_seq_len=256,
        num_layers=len(windows),
        att_cap=50.0,
        final_cap=30.0,
        query_scale=QueryScaleType.SQRT_KEY_SIZE,
        weight=Type.F32,
    )
    c.layer_configs = [lc for _ in windows]
    c.attention_window_sizes = list(windows)
    return c


# seq_len=63: round_up(64, 16) = 64 rows -> 8 rows/shard on the 8-mesh;
# i8 pads to round_up(64, 32) = 64 too.
SEQ = 63


# local_slack=32 >= the prefill chunk (the KVCache contract: a chunk may
# not clobber rows its own earlier queries still attend to).
def _prefilled(config, params, batch, t, kv_kind, seed=0):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(
        rng.integers(0, config.vocab_size, (batch, t)), jnp.int32)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (batch, 1))
    cache = KVCache.create(config, batch, SEQ, kind=kv_kind,
                           split_local=True, local_slack=32)
    _, cache = forward(params, tokens, positions, cache, config,
                       return_logits="none")
    return cache


def _step_inputs(batch, t):
    return (jnp.full((batch, 1), 7, jnp.int32),
            jnp.full((batch, 1), t, jnp.int32))


@pytest.mark.parametrize("windows", [(16, SEQ + 1), (SEQ + 1, 16)])
def test_cp_decode_matches_dense(windows):
    """f32 cache: one CP step from a shared prefilled cache vs dense.

    Both window orders: layer 0 in the local pool (replicated path) and
    layer 0 in the sharded global pool (the masked-owner write path)."""
    config = cp_config(windows)
    params = synth_params(config, kind="sfp", seed=3)
    batch, t = 2, 32
    cache = _prefilled(config, params, batch, t, "f32")
    tok, pos = _step_inputs(batch, t)

    ref_logits, ref_cache = forward(params, tok, pos, cache.copy(), config,
                                    return_logits="last")

    mesh = make_mesh(8)
    sharded = shard_cache_cp(cache.copy(), mesh)
    step = build_cp_decode(config, mesh, sharded)
    logits, new_cache = step(params, tok, pos, sharded)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-2, atol=2e-2)
    # The row this step wrote at layer 0 is bit-strict: its K/V come from
    # bit-identical GEMMs on the bit-identical embedding.
    is_local0 = new_cache.layer_map[0][0] if new_cache.layer_map else False
    if is_local0:
        row = t % new_cache.seq_len_local
        got = np.asarray(new_cache.kv_local)[:, 0, :, :, row]
        want = np.asarray(ref_cache.kv_local)[:, 0, :, :, row]
    else:
        row = t % SEQ
        got = np.asarray(new_cache.kv)[:, 0, :, :, row]
        want = np.asarray(ref_cache.kv)[:, 0, :, :, row]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # Untouched rows of every pool are bit-identical to the dense cache
    # (the masked non-owner writes must be value-level no-ops).
    np.testing.assert_allclose(np.asarray(new_cache.kv)[:, 1:],
                               np.asarray(ref_cache.kv)[:, 1:], rtol=2e-2,
                               atol=2e-2)


def test_cp_nonowner_writes_are_noops():
    """Every global-pool row except the one written this step is
    bit-identical before/after (the clamped non-owner scatter rewrites
    current contents)."""
    config = cp_config((SEQ + 1, SEQ + 1))
    params = synth_params(config, kind="f32", seed=5)
    batch, t = 2, 16
    cache = _prefilled(config, params, batch, t, "f32", seed=5)
    tok, pos = _step_inputs(batch, t)

    mesh = make_mesh(8)
    sharded = shard_cache_cp(cache.copy(), mesh)
    step = build_cp_decode(config, mesh, sharded)
    _, new_cache = step(params, tok, pos, sharded)

    before = np.asarray(cache.kv)
    after = np.asarray(new_cache.kv)
    row = t % SEQ
    mask = np.ones(after.shape[4], bool)
    mask[row] = False
    np.testing.assert_array_equal(after[:, :, :, :, mask],
                                  before[:, :, :, :, mask])
    assert not np.allclose(after[:, :, :, :, row], before[:, :, :, :, row])


@pytest.mark.parametrize("kv_kind", ["bf16", "i8"])
def test_cp_decode_production_caches(kv_kind):
    """bf16/i8 caches: the dense fallback rounds probs to the cache
    dtype before the PV dot, which the distributed merge cannot
    reproduce — bound the drift (the same contract as ring attention,
    tests/test_ring_attention.py)."""
    config = cp_config((16, SEQ + 1))
    params = synth_params(config, kind="f32", seed=9)
    batch, t = 2, 32
    cache = _prefilled(config, params, batch, t, kv_kind, seed=9)
    tok, pos = _step_inputs(batch, t)

    ref_logits, _ = forward(params, tok, pos, cache.copy(), config,
                            return_logits="last")
    mesh = make_mesh(8)
    sharded = shard_cache_cp(cache.copy(), mesh)
    step = build_cp_decode(config, mesh, sharded)
    logits, _ = step(params, tok, pos, sharded)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=3e-2, atol=3e-2)


def test_cp_multi_step_ring_wrap():
    """Decode past the ring boundary: steps at positions SEQ-2 .. SEQ+2
    wrap rows through every shard owner; logits stay bounded vs dense."""
    config = cp_config((SEQ + 1, SEQ + 1))
    params = synth_params(config, kind="f32", seed=11)
    batch, t = 2, SEQ - 2
    cache = _prefilled(config, params, batch, t, "f32", seed=11)
    dense_cache = cache.copy()
    mesh = make_mesh(8)
    sharded = shard_cache_cp(cache.copy(), mesh)
    step = build_cp_decode(config, mesh, sharded)

    for i in range(5):
        tok = jnp.full((batch, 1), 3 + i, jnp.int32)
        pos = jnp.full((batch, 1), t + i, jnp.int32)
        ref_logits, dense_cache = forward(params, tok, pos, dense_cache,
                                          config, return_logits="last")
        logits, sharded = step(params, tok, pos, sharded)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(ref_logits),
                                   rtol=3e-2, atol=3e-2, err_msg=f"step {i}")


def test_sp_prefill_to_cp_decode():
    """The long-context chain: SP prefill -> scatter_into_cache ->
    shard_cache_cp -> CP decode, vs a fully dense prefill + decode."""
    from gemma_tpu.parallel.sp import build_sp_prefill, scatter_into_cache

    config = cp_config((16, SEQ + 1))
    params = synth_params(config, kind="f32", seed=13)
    batch, t = 2, 32
    rng = np.random.default_rng(13)
    tokens = jnp.asarray(
        rng.integers(0, config.vocab_size, (batch, t)), jnp.int32)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (batch, 1))
    pe = jnp.zeros((batch,), jnp.int32)

    dense_cache = KVCache.create(config, batch, SEQ, split_local=True,
                                 local_slack=32)
    _, dense_cache = forward(params, tokens, positions, dense_cache, config,
                             return_logits="none")

    mesh = make_mesh(8)
    sp = build_sp_prefill(config, mesh)
    _, ks, vs = sp(params, tokens, positions, pe)
    cache = scatter_into_cache(
        KVCache.create(config, batch, SEQ, split_local=True, local_slack=32),
        ks, vs, positions)
    sharded = shard_cache_cp(cache, mesh)
    step = build_cp_decode(config, mesh, sharded)

    tok, pos = _step_inputs(batch, t)
    ref_logits, _ = forward(params, tok, pos, dense_cache, config,
                            return_logits="last")
    logits, _ = step(params, tok, pos, sharded)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=3e-2, atol=3e-2)


def test_cp_decode_chunk_matches_steps():
    """The k-step greedy scan reproduces k sequential argmax-fed CP
    steps exactly (same math, one executable)."""
    from gemma_tpu.parallel.cp import build_cp_decode_chunk

    config = cp_config((16, SEQ + 1))
    params = synth_params(config, kind="f32", seed=17)
    batch, t, k = 2, 32, 4
    cache = _prefilled(config, params, batch, t, "bf16", seed=17)
    tok, pos = _step_inputs(batch, t)

    mesh = make_mesh(8)
    step = build_cp_decode(config, mesh, cache)
    chunk = build_cp_decode_chunk(config, mesh, cache, k)

    want_toks = []
    c = shard_cache_cp(cache.copy(), mesh)
    cur_tok, cur_pos = tok, pos
    for _ in range(k):
        logits, c = step(params, cur_tok, cur_pos, c)
        cur_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        want_toks.append(np.asarray(cur_tok[:, 0]))
        cur_pos = cur_pos + 1
    want = np.stack(want_toks, axis=1)

    sharded = shard_cache_cp(cache.copy(), mesh)
    got, c2 = chunk(params, tok, pos, sharded)
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_allclose(np.asarray(c2.kv), np.asarray(c.kv),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2.kv_local),
                               np.asarray(c.kv_local), rtol=1e-6, atol=1e-6)


def test_shard_cache_cp_rejects_indivisible_ring():
    """The guard fires before any device_put when the padded ring does
    not divide over the axis (48 rows over 7 chips)."""
    config = cp_config((SEQ + 1, SEQ + 1))
    cache = KVCache.create(config, 2, 38)  # round_up(39, 16) = 48 rows

    class SevenChipAxis:
        shape = {"model": 7}

    with pytest.raises(ValueError, match="does not divide"):
        shard_cache_cp(cache, SevenChipAxis())
