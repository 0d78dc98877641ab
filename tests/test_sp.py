"""Sequence-parallel prefill (parallel/sp.py) vs the single-device path.

The oracle is the oracle-verified models/gemma.py forward: SP shards the
prefill T over 8 virtual devices, attends via the ppermute KV ring, and
must reproduce the dense logits, the cache contents, and — after
`scatter_into_cache` — an identical decode continuation (the contract the
reference's prefill/decode split guarantees on one node,
gemma/gemma.cc:188-283)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemma_tpu.models.configs import (
    LayerConfig,
    Model,
    ModelConfig,
    PostNormType,
    QueryScaleType,
)
from gemma_tpu.compression import Type
from gemma_tpu.models.gemma import forward
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.ops.matmul import matmul
from gemma_tpu.ops.ops import soft_cap
from gemma_tpu.parallel.mesh import make_mesh
from gemma_tpu.parallel.sp import build_sp_prefill, scatter_into_cache
from gemma_tpu.utils.synth import synth_params


def sp_config(num_layers=2, window=None, use_qk_norm=False):
    model_dim, heads, kv_heads, qkv_dim, ff = 64, 4, 2, 32, 128
    lc = LayerConfig(
        model_dim=model_dim,
        ff_hidden_dim=ff,
        heads=heads,
        kv_heads=kv_heads,
        qkv_dim=qkv_dim,
        post_norm=PostNormType.SCALE,
        use_qk_norm=use_qk_norm,
    )
    c = ModelConfig(
        model=Model.GEMMA2_2B,
        model_dim=model_dim,
        vocab_size=256,
        max_seq_len=128,
        num_layers=num_layers,
        att_cap=50.0,
        final_cap=30.0,
        query_scale=QueryScaleType.SQRT_KEY_SIZE,
        weight=Type.F32,
    )
    c.layer_configs = [lc for _ in range(num_layers)]
    c.attention_window_sizes = [window or c.max_seq_len] * num_layers
    return c


def _prompt(config, batch, t, seed=0):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(
        rng.integers(0, config.vocab_size, (batch, t)), jnp.int32)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (batch, 1))
    return tokens, positions


def _last_logits(config, params, x_last):
    logits = matmul(x_last, params.embedding, out_dtype=jnp.float32,
                    prologue_norm=params.final_norm)
    return soft_cap(config.final_cap, logits)


@pytest.mark.parametrize("kind,window", [("f32", None), ("sfp", None),
                                         ("f32", 16)])
def test_sp_prefill_matches_dense(kind, window):
    """Last-token logits and cache K/V match the dense prefill.

    Layer-0 K/V are checked STRICTLY: every GEMM is bit-identical across
    the M split (measured: M=128 vs 8x M=16 slices, all layer shapes, all
    codecs) and layer 0 sees bit-exact inputs, so any real SP bug (mask,
    ring rotation, RoPE, layout) shows up as O(1) error here.  Deeper
    activations get a loose bound: the only SP-vs-dense numeric delta is
    the online-softmax merge reorder (~1e-5), but the bf16 activation
    rounding between layers amplifies any nonzero drift to whole bf16
    ulps (~0.8%) when a value straddles a rounding boundary — measured
    1.7e-5 at blocks.0 -> 8.7e-3 at blocks.1 on the sfp seed."""
    config = sp_config(window=window)
    params = synth_params(config, kind=kind, seed=3)
    batch, t, seq_len = 2, 64, 128
    tokens, positions = _prompt(config, batch, t)
    pe = jnp.zeros((batch,), jnp.int32)

    ref_logits, ref_cache = forward(
        params, tokens, positions,
        KVCache.create(config, batch, seq_len, kind="f32"), config,
        return_logits="last")

    mesh = make_mesh(8)
    sp = build_sp_prefill(config, mesh, kv_dtype=jnp.float32)
    x, ks, vs = sp(params, tokens, positions, pe)
    sp_logits = _last_logits(config, params, x[:, -1, :])
    np.testing.assert_allclose(np.asarray(sp_logits), np.asarray(ref_logits),
                               rtol=2e-2, atol=2e-2)

    cache = scatter_into_cache(
        KVCache.create(config, batch, seq_len, kind="f32"), ks, vs,
        positions)
    # Layer 0: strict (bit-exact GEMMs on bit-exact inputs; only the
    # scatter itself between SP and the dense write path).  Layer 0 lives
    # in whichever pool (global/local) the window routing put it in.
    l0, ref_l0 = ((cache.kv, ref_cache.kv) if cache.kv.shape[1]
                  else (cache.kv_local, ref_cache.kv_local))
    np.testing.assert_allclose(np.asarray(l0[:, 0]),
                               np.asarray(ref_l0[:, 0]), rtol=1e-6,
                               atol=1e-6)
    # Deeper layers inherit the bf16-cliff-amplified attention drift.
    np.testing.assert_allclose(np.asarray(cache.kv),
                               np.asarray(ref_cache.kv), rtol=2e-2,
                               atol=2e-2)
    if cache.kv_local is not None:
        np.testing.assert_allclose(np.asarray(cache.kv_local),
                                   np.asarray(ref_cache.kv_local),
                                   rtol=2e-2, atol=2e-2)


def test_sp_prefill_bf16_cache():
    """Production bf16 KV: the dense fallback additionally rounds softmax
    probs to bf16 (matching the Pallas kernels' MXU inputs), which the
    online-softmax merge cannot reproduce — bound the drift instead."""
    config = sp_config()
    params = synth_params(config, kind="f32", seed=3)
    batch, t, seq_len = 2, 64, 128
    tokens, positions = _prompt(config, batch, t)
    pe = jnp.zeros((batch,), jnp.int32)

    ref_logits, _ = forward(
        params, tokens, positions, KVCache.create(config, batch, seq_len),
        config, return_logits="last")
    sp = build_sp_prefill(config, make_mesh(8))
    x, _, _ = sp(params, tokens, positions, pe)
    sp_logits = _last_logits(config, params, x[:, -1, :])
    np.testing.assert_allclose(np.asarray(sp_logits), np.asarray(ref_logits),
                               rtol=3e-2, atol=3e-2)


def test_sp_prefill_prefix_lm():
    """Bidirectional prefix (attention.cc:207-211) across shard bounds."""
    config = sp_config(use_qk_norm=True)
    params = synth_params(config, kind="f32", seed=5)
    batch, t, seq_len = 2, 32, 64
    tokens, positions = _prompt(config, batch, t, seed=5)
    pe = jnp.asarray([13, 29], jnp.int32)  # spans shard boundaries (t/8=4)

    ref_logits, _ = forward(
        params, tokens, positions,
        KVCache.create(config, batch, seq_len, kind="f32"), config,
        prefix_end=pe, return_logits="last")

    sp = build_sp_prefill(config, make_mesh(8), kv_dtype=jnp.float32)
    x, _, _ = sp(params, tokens, positions, pe)
    sp_logits = _last_logits(config, params, x[:, -1, :])
    np.testing.assert_allclose(np.asarray(sp_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("kv_kind", ["bf16", "i8"])
def test_sp_decode_continuation(kv_kind):
    """SP prefill -> scatter_into_cache -> dense decode step: the
    continuation logits match a fully dense prefill+decode, for the
    production cache kinds (i8 re-quantizes rows in update())."""
    config = sp_config(window=16)
    params = synth_params(config, kind="f32", seed=9)
    batch, t, seq_len = 2, 32, 64
    tokens, positions = _prompt(config, batch, t, seed=9)
    pe = jnp.zeros((batch,), jnp.int32)

    ref_cache = KVCache.create(config, batch, seq_len, kind=kv_kind)
    _, ref_cache = forward(params, tokens, positions, ref_cache, config,
                           return_logits="none")

    sp = build_sp_prefill(config, make_mesh(8))
    x, ks, vs = sp(params, tokens, positions, pe)
    cache = scatter_into_cache(
        KVCache.create(config, batch, seq_len, kind=kv_kind), ks, vs,
        positions)

    next_tok = jnp.full((batch, 1), 7, jnp.int32)
    next_pos = jnp.full((batch, 1), t, jnp.int32)
    ref_logits, _ = forward(params, next_tok, next_pos, ref_cache, config,
                            return_logits="last")
    sp_logits, _ = forward(params, next_tok, next_pos, cache, config,
                           return_logits="last")
    # Layer-1 K/V inherit layer-0's attention drift (the dense fallback
    # rounds softmax probs to the cache dtype; the ring merge cannot), so
    # this bounds propagation, not bit-parity.
    np.testing.assert_allclose(np.asarray(sp_logits), np.asarray(ref_logits),
                               rtol=1e-2, atol=1e-2)


def test_scatter_wrapped_ring_has_no_duplicate_rows():
    """T > a pool's ring length: one scatter call must keep only the
    newest position per ring row (XLA scatter order for duplicate
    indices is undefined — the oracle is two chunked scatters, each with
    unique rows)."""
    config = sp_config(window=16)
    batch, t = 2, 48
    # window 16 + slack 8 -> local ring 24 < t: positions wrap the ring.
    from gemma_tpu.models.kv_cache import KVCache

    cache_a = KVCache.create(config, batch, 64, kind="f32", local_slack=8)
    cache_b = cache_a.copy()
    assert cache_a.seq_len_local == 24

    rng = np.random.default_rng(21)
    L = config.num_layers
    kh, qd = 2, 32
    ks = jnp.asarray(rng.standard_normal((L, batch, t, kh, qd)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((L, batch, t, kh, qd)), jnp.float32)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (batch, 1))

    got = scatter_into_cache(cache_a, ks, vs, positions)
    # Oracle: chunks of 24 positions — every chunk's rows are unique.
    want = cache_b
    for lo in range(0, t, 24):
        hi = min(lo + 24, t)
        want = scatter_into_cache(want, ks[:, :, lo:hi], vs[:, :, lo:hi],
                                  positions[:, lo:hi])
    # Compare ring rows only: dead (wrapped-over) positions land in the
    # garbage row, whose content is unspecified by design.
    ring_l = got.seq_len_local
    np.testing.assert_array_equal(
        np.asarray(got.kv_local)[:, :, :, :, :ring_l],
        np.asarray(want.kv_local)[:, :, :, :, :ring_l])
    if got.kv.shape[1]:
        np.testing.assert_array_equal(
            np.asarray(got.kv)[:, :, :, :, :got.seq_len],
            np.asarray(want.kv)[:, :, :, :, :got.seq_len])
