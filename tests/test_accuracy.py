"""Device accuracy-dot options (ops/accuracy.py; maps dot-inl.h:158-416)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gemma_tpu.ops.accuracy import cascaded_dot, cascaded_sum, dot_f64, two_sum


def test_two_sum_exact():
    a = jnp.float32(1e8)
    b = jnp.float32(1.0 + 2**-20)
    s, e = two_sum(a, b)
    # a + b is not representable; s + e recovers it exactly in f64.
    assert float(s) + float(e) == 1e8 + float(np.float32(1.0 + 2**-20))


def test_cascaded_sum_beats_naive():
    rng = np.random.default_rng(0)
    # Large cancellations: pairs (x, -x) plus a small signal.
    x = rng.normal(0, 1e6, 4096).astype(np.float32)
    parts = np.stack([x, -x + np.float32(1e-2)]).reshape(-1)
    rng.shuffle(parts)
    want = np.sum(parts.astype(np.float64))
    got = float(cascaded_sum(jnp.asarray(parts.reshape(-1, 1)), axis=0)[0])
    naive = float(jnp.sum(jnp.asarray(parts)))
    assert abs(got - want) <= abs(naive - want)
    assert abs(got - want) / abs(want) < 1e-5


def test_cascaded_dot_vs_f64():
    rng = np.random.default_rng(1)
    m, k, n = 4, 4096, 64
    # bf16-rounded inputs: products are exact in f32, so the only error is
    # accumulation — exactly what cascaded_dot compensates.
    a = np.asarray(jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32))
                   .astype(jnp.bfloat16).astype(jnp.float32))
    b = np.asarray(jnp.asarray(rng.normal(0, 1, (n, k)).astype(np.float32))
                   .astype(jnp.bfloat16).astype(jnp.float32))
    want = dot_f64(a, b)
    got = np.asarray(cascaded_dot(jnp.asarray(a), jnp.asarray(b),
                                  chunk=256), np.float64)
    plain = np.asarray(
        jnp.asarray(a) @ jnp.asarray(b).T, np.float64)
    err_casc = np.abs(got - want).max()
    err_plain = np.abs(plain - want).max()
    assert err_casc <= err_plain
    assert err_casc / np.abs(want).max() < 1e-6


def test_cross_entropy_precise_modes_agree():
    """precise="f64"/"cascaded" CE within rounding of the production path
    on the tiny model (and of each other)."""
    from gemma_tpu.evals.cross_entropy import compute_cross_entropy
    from tests.test_model import random_weights, tiny_config, to_params

    config = tiny_config(num_layers=2)
    rng = np.random.default_rng(5)
    params = to_params(random_weights(config, rng), config)
    prompt = [int(t) for t in rng.integers(2, 100, 14)]

    base = compute_cross_entropy(params, config, prompt)
    f64 = compute_cross_entropy(params, config, prompt, precise="f64")
    casc = compute_cross_entropy(params, config, prompt, precise="cascaded")
    assert abs(f64 - casc) < 1e-3          # both near-exact
    assert abs(base - f64) < 0.02 * max(abs(f64), 1.0)  # production drift

    # f32-KV reference-parity option runs too.
    f32kv = compute_cross_entropy(params, config, prompt, precise="f64",
                                  kv_kind="f32")
    assert abs(f32kv - f64) < 0.02 * max(abs(f64), 1.0)
