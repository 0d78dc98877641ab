"""Scan-over-layers decode (engine/scan_decode.py) vs the unrolled dense
forward.

On TPU both paths run the IDENTICAL Pallas kernels (the scan only changes
how the layer index reaches the block index maps) and scripts/tpu_parity.py
checks them bit-strictly on hardware.  On CPU, XLA fuses the composed
rope/quantize math differently inside a lax.scan body than unrolled (fma
contraction), so the written KV rows can differ by ~1 f32 ulp — this
suite therefore asserts to a few-ulp tolerance (and exact token ids).

Covers: uniform and alternating-window (two KV pools) configs, f32 and
i8 KV caches, every logits head, the valid mask, and multi-step decode
chains (cache state drift would show immediately)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemma_tpu.engine.scan_decode import (build_scan_params, detect_period,
                                          forward_scan)
from gemma_tpu.models.gemma import forward
from gemma_tpu.models.kv_cache import KVCache
from tests.test_model import random_weights, tiny_config, to_params


def _aligned(config):
    """Lane-align the tiny config (every GEMM dim a multiple of 128) so
    the stacked kernels pick the SAME tile-exact grids as the unrolled
    path and the comparison can be bit-strict — real model layouts are
    128-aligned too (CLAUDE.md: device layouts tile-exact at load).
    Unaligned stored dims make the unrolled path pad K to 128 while the
    stacked path stays exact; the differing reduction shapes flip
    prologue-norm rsqrt args by ~1 ulp (reduction order, not a bug)."""
    config.model_dim = 128
    for lc in config.layer_configs:
        lc.model_dim = 128
        lc.heads, lc.kv_heads, lc.qkv_dim = 2, 1, 128
        lc.ff_hidden_dim = 128
    return config


def _setup(num_layers=4, window=None, use_qk_norm=False, kv_kind="f32",
           windows=None, batch=2, seed=0):
    config = _aligned(tiny_config(num_layers=num_layers,
                                  use_qk_norm=use_qk_norm, window=window))
    if windows is not None:
        config.attention_window_sizes = [
            windows[i % len(windows)] for i in range(num_layers)]
    rng = np.random.default_rng(seed)
    params = to_params(random_weights(config, rng), config)
    sparams = build_scan_params(params, config)
    assert sparams is not None
    # local_slack small enough that window-16 layers split into a local
    # pool at seq_len 64 (prefill stays within the slack: n_pre <= 8).
    cache_a = KVCache.create(config, batch=batch, local_slack=8,
                             seq_len=config.max_seq_len, kind=kv_kind)
    cache_b = KVCache.create(config, batch=batch, local_slack=8,
                             seq_len=config.max_seq_len, kind=kv_kind)
    # Prefill both caches identically through the dense path.
    n_pre = 6
    toks = jnp.asarray(rng.integers(1, config.vocab_size, (batch, n_pre)),
                       jnp.int32)
    pos = jnp.tile(jnp.arange(n_pre, dtype=jnp.int32), (batch, 1))
    _, cache_a = forward(params, toks, pos, cache_a, config,
                         return_logits="none")
    _, cache_b = forward(params, toks, pos, cache_b, config,
                         return_logits="none")
    return config, params, sparams, cache_a, cache_b, rng, n_pre


def _assert_cache_equal(ca, cb):
    for name in ("kv", "kv_local", "kv_scale", "kv_local_scale"):
        a, b = getattr(ca, name), getattr(cb, name)
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=2e-6)


def _assert_close(a, b):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kv_kind", ["f32", "i8"])
@pytest.mark.parametrize("windows", [None, (16, 64)])
def test_scan_decode_bitmatches_unrolled(kv_kind, windows):
    """3 chained decode steps: logits AND cache pools bit-identical."""
    config, params, sparams, ca, cb, rng, n_pre = _setup(
        num_layers=4, windows=windows, kv_kind=kv_kind)
    if windows is not None:
        assert cb.layer_map, "alternating windows must split pools"
    b = ca.batch
    tok = jnp.asarray(rng.integers(1, config.vocab_size, (b, 1)), jnp.int32)
    for step in range(3):
        pos = jnp.full((b, 1), n_pre + step, jnp.int32)
        ref, ca = forward(params, tok, pos, ca, config,
                          return_logits="last")
        got, cb = forward_scan(sparams, tok, pos, cb, config,
                               return_logits="last")
        _assert_close(ref, got)
        _assert_cache_equal(ca, cb)
        tok = jnp.argmax(ref, axis=-1).astype(jnp.int32)[:, None]


def test_scan_decode_qk_norm_period():
    config, params, sparams, ca, cb, rng, n_pre = _setup(
        num_layers=6, windows=(16, 16, 64), use_qk_norm=True)
    assert detect_period(config) == 3
    assert len(sparams.layers) == 3
    b = ca.batch
    tok = jnp.asarray(rng.integers(1, config.vocab_size, (b, 1)), jnp.int32)
    pos = jnp.full((b, 1), n_pre, jnp.int32)
    ref, ca = forward(params, tok, pos, ca, config, return_logits="last")
    got, cb = forward_scan(sparams, tok, pos, cb, config,
                           return_logits="last")
    _assert_close(ref, got)
    _assert_cache_equal(ca, cb)


def test_scan_decode_heads_and_valid():
    """top1/topk heads and the valid mask (garbage-row writes) match."""
    config, params, sparams, ca, cb, rng, n_pre = _setup(num_layers=4)
    b = ca.batch
    tok = jnp.asarray(rng.integers(1, config.vocab_size, (b, 1)), jnp.int32)
    pos = jnp.full((b, 1), n_pre, jnp.int32)
    valid = jnp.asarray([[True], [False]])

    (rt, rp), ca2 = forward(params, tok, pos, dataclasses.replace(ca).copy(),
                            config, return_logits="top1", valid=valid)
    (gt, gp), cb2 = forward_scan(sparams, tok, pos, cb.copy(), config,
                                 return_logits="top1", valid=valid)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(gt))
    _assert_close(rp, gp)
    _assert_cache_equal(ca2, cb2)

    (rv, ri), _ = forward(params, tok, pos, ca.copy(), config,
                          return_logits="topk", top_k_n=4)
    (gv, gi), _ = forward_scan(sparams, tok, pos, cb.copy(), config,
                               return_logits="topk", top_k_n=4)
    _assert_close(rv, gv)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(gi))


def test_scan_decode_under_jit_and_scan():
    """The deployment shape: a jitted k-step greedy chain (lax.scan over
    steps wrapping the lax.scan over layers) matches the unrolled chain."""
    config, params, sparams, ca, cb, rng, n_pre = _setup(
        num_layers=4, windows=(16, 64))
    b = ca.batch
    tok0 = jnp.asarray(rng.integers(1, config.vocab_size, (b, 1)), jnp.int32)
    k = 4

    def chain(fwd, p, cache):
        def body(carry, _):
            tok, pos, cache = carry
            logits, cache = fwd(p, tok, pos, cache, config,
                                return_logits="last")
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            return (nxt, pos + 1, cache), nxt[:, 0]

        pos = jnp.full((b, 1), n_pre, jnp.int32)
        (_, _, cache), toks = jax.lax.scan(body, (tok0, pos, cache), None,
                                           length=k)
        return toks, cache

    ref, ca = jax.jit(lambda p, c: chain(forward, p, c))(params, ca)
    got, cb = jax.jit(lambda p, c: chain(forward_scan, p, c))(sparams, cb)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    _assert_cache_equal(ca, cb)


def test_build_scan_params_rejects_heterogeneous():
    config = tiny_config(num_layers=3)
    config.attention_window_sizes = [64, 16, 16]  # period 3 == L -> T=1
    rng = np.random.default_rng(0)
    params = to_params(random_weights(config, rng), config)
    assert build_scan_params(params, config) is None
