"""Ops tests vs scalar/numpy oracles, mirroring ops/ops_test.cc."""

import jax
import jax.numpy as jnp
import numpy as np

from gemma_tpu.ops import ops, sampling


def test_rms_norm():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (4, 128)).astype(np.float32)
    w = rng.normal(0, 0.1, 128).astype(np.float32)
    got = np.asarray(ops.rms_norm(jnp.asarray(x), jnp.asarray(w)))
    mul = 1.0 / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + 1e-6)
    want = x * mul * (1.0 + w)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_layer_norm():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 64)).astype(np.float32)
    s = rng.normal(1, 0.1, 64).astype(np.float32)
    b = rng.normal(0, 0.1, 64).astype(np.float32)
    got = np.asarray(ops.layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b)))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mu) / np.sqrt(var + 1e-6) * s + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gelu():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    got = np.asarray(ops.gelu(jnp.asarray(x)))
    want = x * 0.5 * (1 + np.tanh(x * (0.797884560804236 + 0.03567740813636141 * x**2)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # Reference tolerance vs exact gelu (ops_test.cc): within 1.5e-2.
    from scipy.special import erf  # noqa: F401 — skip if unavailable

    exact = x * 0.5 * (1 + erf(x / np.sqrt(2)))
    assert np.abs(got - exact).max() < 6e-3


def test_soft_cap():
    x = np.array([-100.0, -5.0, 0.0, 5.0, 100.0], np.float32)
    got = np.asarray(ops.soft_cap(30.0, jnp.asarray(x)))
    np.testing.assert_allclose(got, 30.0 * np.tanh(x / 30.0), rtol=1e-6)
    assert np.abs(got).max() <= 30.0
    # cap=0 is the no-op sentinel.
    np.testing.assert_array_equal(np.asarray(ops.soft_cap(0.0, jnp.asarray(x))), x)


def test_inv_timescale():
    ts = ops.create_inv_timescale(256)
    assert ts.shape == (128,)
    assert ts[0] == 1.0
    np.testing.assert_allclose(
        ts, 1.0 / np.power(10000.0, 2.0 * np.arange(128) / 256.0), rtol=1e-7
    )
    # Half-rope halves the rotated dims.
    assert ops.create_inv_timescale(256, half_rope=True).shape == (64,)
    # Gemma3 VLM global layers use base 1e6 (activations.h:77-79).
    ts_g = ops.create_inv_timescale(256, base_frequency=1e6)
    assert ts_g[-1] < ts[-1]


def test_rope_matches_scalar():
    """Scalar oracle from ops-inl.h:358-420: rotate pairs (i, i+half)."""
    rng = np.random.default_rng(2)
    dim = 64
    x = rng.normal(0, 1, dim).astype(np.float32)
    inv_ts = ops.create_inv_timescale(dim)
    for pos in (0, 1, 7, 1000):
        got = np.asarray(ops.rope(jnp.asarray(x), jnp.asarray(pos), jnp.asarray(inv_ts)))
        want = np.empty_like(x)
        half = dim // 2
        for d in range(half):
            theta = pos * inv_ts[d]
            c, s = np.cos(theta), np.sin(theta)
            want[d] = x[d] * c - x[d + half] * s
            want[d + half] = x[d] * s + x[d + half] * c
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rope_mul():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 32).astype(np.float32)
    inv_ts = ops.create_inv_timescale(32)
    a = np.asarray(ops.rope(jnp.asarray(x), 5, jnp.asarray(inv_ts), mul=0.25))
    b = 0.25 * np.asarray(ops.rope(jnp.asarray(x), 5, jnp.asarray(inv_ts)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_rope_batched_positions():
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (3, 32)).astype(np.float32)
    inv_ts = jnp.asarray(ops.create_inv_timescale(32))
    pos = jnp.asarray([0, 5, 9])
    got = np.asarray(ops.rope(jnp.asarray(x), pos, inv_ts))
    for i, p in enumerate([0, 5, 9]):
        row = np.asarray(ops.rope(jnp.asarray(x[i]), p, inv_ts))
        np.testing.assert_allclose(got[i], row, rtol=1e-6)


def test_embedding_scaling():
    # bf16(sqrt(2304)) = bf16(48.0) = 48.0.
    assert ops.embedding_scaling(2304) == 48.0
    # bf16(sqrt(2048)) = bf16(45.2548...) = 45.25.
    assert ops.embedding_scaling(2048) == 45.25


def test_softmax():
    rng = np.random.default_rng(5)
    x = rng.normal(0, 10, (2, 1000)).astype(np.float32)
    got = np.asarray(ops.softmax(jnp.asarray(x)))
    e = np.exp(x - x.max(-1, keepdims=True))
    np.testing.assert_allclose(got, e / e.sum(-1, keepdims=True), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-6)


def test_top1():
    logits = jnp.asarray(np.array([[0.0, 3.0, 1.0], [9.0, 1.0, 1.0]], np.float32))
    tokens, probs = sampling.top1(logits)
    np.testing.assert_array_equal(np.asarray(tokens), [1, 0])
    e0 = np.exp(np.array([0.0, 3.0, 1.0]) - 3.0)
    assert np.allclose(probs[0], e0[1] / e0.sum())


def test_sample_top_k_deterministic_t0():
    logits = jnp.asarray(np.array([1.0, 5.0, 2.0, 4.0], np.float32))
    key = jax.random.PRNGKey(0)
    token, prob = sampling.sample_top_k(logits, key, top_k=2, temperature=0.0)
    assert int(token) == 1


def test_sample_top_k_distribution():
    """Empirical frequencies match the top-k softmax."""
    logits = jnp.asarray(np.array([0.0, 1.0, 2.0, -1e9], np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), 3000)
    sample = jax.jit(
        jax.vmap(lambda k: sampling.sample_top_k(logits, k, 3, 1.0)[0])
    )
    tokens = np.asarray(sample(keys))
    counts = np.bincount(tokens, minlength=4) / len(tokens)
    e = np.exp(np.array([0.0, 1.0, 2.0]))
    want = e / e.sum()
    assert counts[3] == 0.0
    np.testing.assert_allclose(counts[:3], want, atol=0.04)


def test_temperature_sharpens():
    logits = jnp.asarray(np.array([0.0, 1.0, 2.0], np.float32))
    keys = jax.random.split(jax.random.PRNGKey(2), 2000)
    for temp, min_frac in ((0.2, 0.95), (1.0, 0.5)):
        sample = jax.jit(
            jax.vmap(lambda k: sampling.sample_top_k(logits, k, 3, temp)[0])
        )
        tokens = np.asarray(sample(keys))
        frac_top = (tokens == 2).mean()
        assert frac_top >= min_frac, (temp, frac_top)


def test_avg_pool_4x4():
    rng = np.random.default_rng(6)
    x = rng.normal(0, 1, (4096, 8)).astype(np.float32)
    got = np.asarray(ops.avg_pool_4x4(jnp.asarray(x)))
    assert got.shape == (256, 8)
    # Output row (r, c) averages input rows (4r+i)*64 + 4c+j.
    want = x.reshape(16, 4, 16, 4, 8).mean(axis=(1, 3)).reshape(256, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
