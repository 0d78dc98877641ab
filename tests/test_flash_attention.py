"""Flash prefill + decode kernels vs the XLA reference path
(the flash_attention_test.cc:101-171 parity pattern; kernels run in Pallas
interpret mode on CPU and natively on TPU).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gemma_tpu.models.configs import config_gemma2_2b
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.ops.flash_attention import flash_prefill_attention

CONFIG = config_gemma2_2b()
B, SEQ, KVH, H, D = 2, 32, 4, 8, 256


def filled_cache(rng, n_pos=24):
    cache = KVCache.create(CONFIG, B, SEQ)
    k = jnp.asarray(rng.normal(0, 0.5, (B, n_pos, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, n_pos, KVH, D)).astype(np.float32))
    pos = jnp.tile(jnp.arange(n_pos, dtype=jnp.int32), (B, 1))
    return cache.update(0, pos, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))


@pytest.mark.parametrize("window,prefix", [
    (SEQ, 0),        # global attention
    (8, 0),          # sliding window
    (SEQ, 20),       # prefix-LM bidirectional prefix
])
def test_flash_prefill_matches_reference(window, prefix):
    rng = np.random.default_rng(0)
    cache = filled_cache(rng)
    t = 16
    q = jnp.asarray(rng.normal(0, 1, (B, t, H, D)).astype(np.float32))
    positions = jnp.tile(jnp.arange(8, 8 + t, dtype=jnp.int32), (B, 1))
    pe = jnp.full((B,), prefix, jnp.int32) if prefix else 0

    got = flash_prefill_attention(cache, 0, q, positions, window,
                                  att_cap=50.0, prefix_end=pe,
                                  use_pallas=True, interpret=True)
    want = flash_prefill_attention(cache, 0, q, positions, window,
                                   att_cap=50.0, prefix_end=pe,
                                   use_pallas=False)
    # bf16 PV rounding happens at a different point in the online softmax;
    # the reference asserts 1e-5 for its all-f32 CPU paths, bf16 gives ~5e-3.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_flash_prefill_ring_wraparound():
    """Positions past seq_len must attend through the ring correctly."""
    rng = np.random.default_rng(1)
    cache = KVCache.create(CONFIG, B, SEQ)
    n_pos = SEQ + 16  # wraps
    k = jnp.asarray(rng.normal(0, 0.5, (B, n_pos, KVH, D)).astype(np.float32))
    pos = jnp.tile(jnp.arange(n_pos, dtype=jnp.int32), (B, 1))
    cache = cache.update(0, pos, k.astype(jnp.bfloat16), k.astype(jnp.bfloat16))

    t = 8
    q = jnp.asarray(rng.normal(0, 1, (B, t, H, D)).astype(np.float32))
    positions = jnp.tile(jnp.arange(n_pos - t, n_pos, dtype=jnp.int32), (B, 1))
    got = flash_prefill_attention(cache, 0, q, positions, SEQ, att_cap=50.0,
                                  use_pallas=True, interpret=True)
    want = flash_prefill_attention(cache, 0, q, positions, SEQ, att_cap=50.0,
                                   use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_decode_attention_interpret_matches_reference():
    from gemma_tpu.ops.decode_attention import (_decode_att_pallas,
                                                decode_attention)

    rng = np.random.default_rng(2)
    cache = filled_cache(rng)
    q = jnp.asarray(rng.normal(0, 1, (B, 1, H, D)).astype(np.float32))
    positions = jnp.full((B, 1), 24, jnp.int32)
    want = decode_attention(cache, 0, q, positions, SEQ, att_cap=50.0,
                            use_pallas=False)
    # interpret-mode run of the decode kernel (the wrapper takes a traced
    # layer index — exercise it with both a static int and a jnp scalar).
    qk = q.reshape(B, KVH, H // KVH, D)
    got = _decode_att_pallas(cache.kv, qk, positions[:, 0], 0, SEQ, SEQ,
                             50.0, interpret=True)
    got_traced = _decode_att_pallas(cache.kv, qk, positions[:, 0],
                                    jnp.int32(0), SEQ, SEQ, 50.0,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got_traced))
    got = np.asarray(got).reshape(B, 1, H, D)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-2, atol=8e-3)
