"""Ring (sequence-parallel) attention vs the dense reference path.

Mirrors the reference's FlashAttention-vs-attention parity contract
(gemma/flash_attention_test.cc:101-171): same config family, synthetic
Q/K/V, assert tight relative closeness — here additionally across an
8-device mesh with the sequence sharded and KV blocks rotating on
ppermute (parallel/ring_attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemma_tpu.ops.attention import attention_mask, dot_softmax_weighted_sum
from gemma_tpu.parallel.mesh import make_mesh
from gemma_tpu.parallel.ring_attention import build_ring_attention


def _dense_reference(q, k, v, q_pos, window, att_cap, prefix_end=0):
    """ops/attention.py path over the same linear layout.

    With S > max(pos) the ring reconstruction is the identity (row s
    holds absolute position s), so attention_mask's semantics transfer
    to the linear K/V used here."""
    s = k.shape[1]
    mask = attention_mask(q_pos, s, window, prefix_end)
    kc = k.transpose(0, 2, 1, 3)  # [B, KH, S, D]
    vc = v.transpose(0, 2, 1, 3)
    return dot_softmax_weighted_sum(q, kc, vc, mask, att_cap=att_cap)


def _mk(b=2, t=64, h=4, kh=2, d=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), dtype) * 0.3
    k = jnp.asarray(rng.normal(size=(b, t, kh, d)), dtype) * 0.3
    v = jnp.asarray(rng.normal(size=(b, t, kh, d)), dtype)
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    return q, k, v, pos


@pytest.mark.parametrize("window,att_cap", [(4096, 0.0), (16, 50.0),
                                            (1, 0.0)])
def test_ring_attention_matches_dense(window, att_cap):
    q, k, v, pos = _mk()
    ref = _dense_reference(q, k, v, pos, window, att_cap)

    mesh = make_mesh(jax.device_count())
    ring = build_ring_attention(mesh, "model", window=window,
                                att_cap=att_cap)
    out = ring(q, k, v, pos, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_ring_attention_prefix_lm():
    """prefix_end > 0: bidirectional attention inside the prefix
    (attention.cc:207-211 semantics)."""
    q, k, v, pos = _mk(seed=3)
    prefix_end = jnp.asarray([13, 40], jnp.int32)
    ref = _dense_reference(q, k, v, pos, 4096, 30.0, prefix_end)

    mesh = make_mesh(jax.device_count())
    ring = build_ring_attention(mesh, "model", window=4096, att_cap=30.0,
                                with_prefix=True)
    out = ring(q, k, v, pos, pos, prefix_end)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_ring_attention_bf16_kv():
    """bf16 K/V (production cache dtype): operand rounding matches the
    dense path's, so only the softmax reassociation differs."""
    q, k, v, pos = _mk(seed=7, dtype=jnp.bfloat16)
    ref = _dense_reference(q.astype(jnp.float32), k, v, pos, 4096, 50.0)

    mesh = make_mesh(jax.device_count())
    ring = build_ring_attention(mesh, "model", window=4096, att_cap=50.0)
    out = ring(q.astype(jnp.float32), k, v, pos, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)


def test_ring_attention_sharded_inputs_stay_sharded():
    """Feeding already-sharded device arrays works and the output keeps
    the sequence sharding (no implicit gather to one device)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v, pos = _mk(seed=11)
    mesh = make_mesh(jax.device_count())
    sh4 = NamedSharding(mesh, P(None, "model", None, None))
    sh2 = NamedSharding(mesh, P(None, "model"))
    qs, ks, vs = (jax.device_put(x, sh4) for x in (q, k, v))
    ps = jax.device_put(pos, sh2)

    ring = build_ring_attention(mesh, "model", window=4096)
    out = ring(qs, ks, vs, ps, ps)
    assert out.sharding.spec == P(None, "model", None, None)
    ref = _dense_reference(q, k, v, pos, 4096, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
