"""Fused KV-write + decode-attention kernel (ops/decode_attention.py:
decode_attention_write) vs the composed write-then-attend pair.

The fused kernel substitutes the just-written row's scores and V
contribution from VMEM instead of re-reading the panel, so the panel's
stale row value must never matter — these tests pin that for every pool
kind, across ring wraparound, windowed layers, and valid-masked slots
(the reference runs write+attend in one pass per layer for the same
reason, gemma/gemma.cc:83-116).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gemma_tpu.models.configs import config_gemma2_2b
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_write,
    kv_write_decode,
)

CONFIG = config_gemma2_2b()
B, SEQ, KVH, H, D = 2, 32, 4, 8, 256


def _prefilled(rng, kind, n_pos):
    cache = KVCache.create(CONFIG, B, SEQ, kind=kind)
    k = jnp.asarray(rng.normal(0, 0.5, (B, n_pos, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, n_pos, KVH, D)).astype(np.float32))
    pos = jnp.tile(jnp.arange(n_pos, dtype=jnp.int32), (B, 1))
    return cache.update(0, pos, k, v)


@pytest.mark.parametrize("kind", ["bf16", "f32", "i8"])
@pytest.mark.parametrize("n_pos,window", [(24, SEQ), (40, SEQ), (40, 16)])
def test_fused_write_attend_matches_composed(kind, n_pos, window):
    """Fused kernel (interpret) == composed write + attend fallback,
    including past ring wraparound (n_pos=40 > SEQ=32) and windowed
    layers; the updated cache pools must be IDENTICAL."""
    rng = np.random.default_rng(n_pos * 10 + window)
    cache_f = _prefilled(rng, kind, n_pos)
    cache_c = cache_f.copy()
    q = jnp.asarray(rng.normal(0, 1, (B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    positions = jnp.full((B, 1), n_pos, jnp.int32)

    got, cache_f = decode_attention_write(
        cache_f, 0, q, positions, k, v, window, att_cap=50.0,
        use_pallas=True, interpret=True)
    cache_c = kv_write_decode(cache_c, 0, positions, k, v, use_pallas=False)
    want = decode_attention(cache_c, 0, q, positions, window, att_cap=50.0,
                            use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(cache_f.kv),
                                  np.asarray(cache_c.kv))
    if kind == "i8":
        np.testing.assert_allclose(np.asarray(cache_f.kv_scale),
                                   np.asarray(cache_c.kv_scale), rtol=1e-6)


@pytest.mark.parametrize("kind", ["bf16", "i8"])
def test_fused_write_attend_valid_mask(kind):
    """Masked slots write the garbage row (s == seq_len) and leave every
    real ring row untouched, exactly like the composed pair."""
    rng = np.random.default_rng(9)
    n_pos = 24
    cache_f = _prefilled(rng, kind, n_pos)
    cache_c = cache_f.copy()
    q = jnp.asarray(rng.normal(0, 1, (B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    positions = jnp.full((B, 1), n_pos, jnp.int32)
    valid = jnp.asarray([[True], [False]])

    got, cache_f = decode_attention_write(
        cache_f, 0, q, positions, k, v, SEQ, att_cap=50.0, valid=valid,
        use_pallas=True, interpret=True)
    cache_c = kv_write_decode(cache_c, 0, positions, k, v, valid=valid,
                              use_pallas=False)
    want = decode_attention(cache_c, 0, q, positions, SEQ, att_cap=50.0,
                            use_pallas=False)
    # Valid slot matches; the masked slot's output is unspecified but the
    # CACHE must match (no real row was clobbered).
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(want)[0],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(cache_f.kv)[:, :, :, :, :SEQ],
        np.asarray(cache_c.kv)[:, :, :, :, :SEQ])


def test_fused_write_attend_panel_budget_fallback():
    """Past the VMEM panel budget the fused path must fall back to the
    composed pair (flash attention) and still return correct results."""
    import gemma_tpu.ops.decode_attention as da

    rng = np.random.default_rng(11)
    n_pos = 24
    cache_f = _prefilled(rng, "bf16", n_pos)
    cache_c = cache_f.copy()
    q = jnp.asarray(rng.normal(0, 1, (B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    positions = jnp.full((B, 1), n_pos, jnp.int32)

    old = da._PANEL_VMEM_BUDGET
    da._PANEL_VMEM_BUDGET = 1  # force the fallback branch
    try:
        got, cache_f = decode_attention_write(
            cache_f, 0, q, positions, k, v, SEQ, att_cap=50.0,
            use_pallas=True)
    finally:
        da._PANEL_VMEM_BUDGET = old
    cache_c = kv_write_decode(cache_c, 0, positions, k, v, use_pallas=False)
    want = decode_attention(cache_c, 0, q, positions, SEQ, att_cap=50.0,
                            use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind", ["bf16", "f32", "i8"])
@pytest.mark.parametrize("post_qk,with_norms", [(0, False), (1, False),
                                                (1, True)])
def test_fused_rope_in_kernel_matches_composed(kind, post_qk, with_norms):
    """rope=RopeSpec path: QK norms + RoPE (+ i8 row quantization) inside
    the kernel must match the composed ops + write + attend pipeline,
    including the written cache rows (codes AND scales identical)."""
    from gemma_tpu.ops import ops
    from gemma_tpu.ops.decode_attention import RopeSpec

    rng = np.random.default_rng(21 + post_qk)
    n_pos = 24
    cache_f = _prefilled(rng, kind, n_pos)
    cache_c = cache_f.copy()
    q = jnp.asarray(rng.normal(0, 1, (B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    positions = jnp.full((B, 1), n_pos, jnp.int32)
    inv_ts = jnp.asarray(ops.create_inv_timescale(D, post_qk == 1))
    qscale = 0.0883883476  # 1/sqrt(128), arbitrary non-1 scale
    kn = qn = None
    if with_norms:
        kn = jnp.asarray(rng.normal(0, 0.1, (D,)).astype(np.float32))
        qn = jnp.asarray(rng.normal(0, 0.1, (D,)).astype(np.float32))
    spec = RopeSpec(inv_ts, post_qk, qscale, key_norm=kn, query_norm=qn)

    got, cache_f = decode_attention_write(
        cache_f, 0, q, positions, k, v, SEQ, att_cap=50.0, rope=spec,
        use_pallas=True, interpret=True)

    # Composed: norms -> rope -> write -> attend (the fallback pipeline).
    pe = ops.half_rope if post_qk == 1 else ops.rope
    kc, qc = k, q
    if with_norms:
        kc = ops.rms_norm(kc, kn)
        qc = ops.rms_norm(qc, qn)
    kc = pe(kc, positions[..., None], inv_ts, 1.0)
    qc = pe(qc, positions[..., None], inv_ts, qscale)
    cache_c = kv_write_decode(cache_c, 0, positions, kc, v,
                              use_pallas=False)
    want = decode_attention(cache_c, 0, qc, positions, SEQ, att_cap=50.0,
                            use_pallas=False)
    if kind == "f32":
        # In-kernel rope vs XLA rope differ by fma-contraction order:
        # f32 rows may carry a 1-ulp delta (bf16/i8 round it away).
        np.testing.assert_allclose(np.asarray(cache_f.kv),
                                   np.asarray(cache_c.kv),
                                   rtol=0, atol=3e-7)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        return
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(cache_f.kv),
                                  np.asarray(cache_c.kv))
    if kind == "i8":
        np.testing.assert_allclose(np.asarray(cache_f.kv_scale),
                                   np.asarray(cache_c.kv_scale), rtol=1e-6)


class _BigSeq:
    """SEQ=96 config scope: big enough for pick_s_block to find a split."""


@pytest.mark.parametrize("kind", ["bf16", "i8"])
@pytest.mark.parametrize("n_pos,window", [(60, 255), (300, 255), (300, 64)])
def test_sblocked_matches_oneshot(kind, n_pos, window, monkeypatch):
    """GEMMA_SBLOCK_DECODE=1: the S-blocked live-frontier kernel matches
    the one-shot fused kernel within online-softmax reorder drift, and
    the updated pools are IDENTICAL (the row write is shared logic) —
    pre-wrap (frontier clamp active), post-wrap (all panels live), and
    windowed."""
    from gemma_tpu.ops.decode_attention import _sublane, pick_s_block

    seq = 255
    rng = np.random.default_rng(n_pos + window)
    cache = KVCache.create(CONFIG, B, seq, kind=kind)
    kpre = jnp.asarray(
        rng.normal(0, 0.5, (B, n_pos, KVH, D)).astype(np.float32))
    vpre = jnp.asarray(
        rng.normal(0, 0.5, (B, n_pos, KVH, D)).astype(np.float32))
    pos_pre = jnp.tile(jnp.arange(n_pos, dtype=jnp.int32), (B, 1))
    cache = cache.update(0, pos_pre, kpre, vpre)
    # The split must actually engage for this pool.
    pool = cache.pool(0)[0]
    row_bytes = pool.shape[3] * pool.shape[5] * jnp.dtype(pool.dtype).itemsize
    assert pick_s_block(
        pool.shape[4], _sublane(pool.dtype), row_bytes,
        lane_multiple=128 if cache.quantized else None) is not None

    q = jnp.asarray(rng.normal(0, 1, (B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    positions = jnp.full((B, 1), n_pos, jnp.int32)

    want, cache_c = decode_attention_write(
        cache.copy(), 0, q, positions, k, v, window, att_cap=50.0,
        use_pallas=True, interpret=True)
    monkeypatch.setenv("GEMMA_SBLOCK_DECODE", "1")
    got, cache_s = decode_attention_write(
        cache.copy(), 0, q, positions, k, v, window, att_cap=50.0,
        use_pallas=True, interpret=True)

    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    err = np.abs(g - w)
    # Drift provenance: the one-shot kernel rounds NORMALIZED probs to
    # bf16 before the V dot; the online kernel rounds the unnormalized
    # exp weights (different magnitudes -> different bf16 ulps, 2^-8 =
    # 3.9e-3 relative), plus f32 reduction reorder.
    bound = 5e-3 * np.abs(w).max() + 5e-3 * np.abs(w)
    assert (err <= bound).all(), float(
        (err / (np.abs(w).max() + 1e-9)).max())
    np.testing.assert_array_equal(np.asarray(cache_s.pool(0)[0]),
                                  np.asarray(cache_c.pool(0)[0]))
    if kind == "i8":
        np.testing.assert_array_equal(
            np.asarray(cache_s.pool_scale(0)),
            np.asarray(cache_c.pool_scale(0)))


def test_sblocked_rope_and_valid_mask(monkeypatch):
    """S-blocked + in-kernel RoPE + a valid-masked slot: outputs within
    drift bound of the one-shot fused kernel; masked slot writes nothing
    live (garbage row only, identical pools)."""
    from gemma_tpu.ops.decode_attention import RopeSpec
    from gemma_tpu.ops.ops import create_inv_timescale

    seq, n_pos = 255, 120
    rng = np.random.default_rng(7)
    cache = KVCache.create(CONFIG, B, seq, kind="i8")
    kpre = jnp.asarray(
        rng.normal(0, 0.5, (B, n_pos, KVH, D)).astype(np.float32))
    vpre = jnp.asarray(
        rng.normal(0, 0.5, (B, n_pos, KVH, D)).astype(np.float32))
    pos_pre = jnp.tile(jnp.arange(n_pos, dtype=jnp.int32), (B, 1))
    cache = cache.update(0, pos_pre, kpre, vpre)

    q = jnp.asarray(rng.normal(0, 1, (B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    positions = jnp.full((B, 1), n_pos, jnp.int32)
    valid = jnp.asarray([[True], [False]])
    rope = RopeSpec(jnp.asarray(create_inv_timescale(D, False)), 0, 0.0625)

    want, cache_c = decode_attention_write(
        cache.copy(), 0, q, positions, k, v, seq, att_cap=50.0,
        valid=valid, rope=rope, use_pallas=True, interpret=True)
    monkeypatch.setenv("GEMMA_SBLOCK_DECODE", "1")
    got, cache_s = decode_attention_write(
        cache.copy(), 0, q, positions, k, v, seq, att_cap=50.0,
        valid=valid, rope=rope, use_pallas=True, interpret=True)

    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    err = np.abs(g - w)
    bound = 5e-3 * np.abs(w).max() + 5e-3 * np.abs(w)  # see bound above
    assert (err <= bound).all()
    np.testing.assert_array_equal(np.asarray(cache_s.pool(0)[0]),
                                  np.asarray(cache_c.pool(0)[0]))
    np.testing.assert_array_equal(np.asarray(cache_s.pool_scale(0)),
                                  np.asarray(cache_c.pool_scale(0)))


def _packed_row(rng, q, k, v):
    """Assemble the qkv GEMM's output row from separate q/k/v arrays
    (q heads kv-major, then per-kv-head interleaved K/V — gemma.py's
    qkv_cat column order)."""
    b = q.shape[0]
    kv = np.stack([np.asarray(k)[:, 0], np.asarray(v)[:, 0]], axis=2)
    return jnp.asarray(np.concatenate(
        [np.asarray(q).reshape(b, H * D), kv.reshape(b, 2 * KVH * D)],
        axis=1))


@pytest.mark.parametrize("kind", ["bf16", "f32", "i8"])
@pytest.mark.parametrize("n_pos,window,post_qk,with_norms", [
    (24, SEQ, 0, False), (40, SEQ, 1, False), (40, 16, 0, False),
    (24, SEQ, 1, True)])
def test_packed_matches_unpacked_fused(kind, n_pos, window, post_qk,
                                       with_norms):
    """decode_attention_write_packed (lane-major qkv row in, [B, H*D]
    bf16 out) == the unpacked fused kernel: outputs equal after the
    host-side bf16 cast, pools and scales IDENTICAL.  Covers ring
    wraparound, windowed layers, both rope modes, and QK norms."""
    from gemma_tpu.ops import ops
    from gemma_tpu.ops.decode_attention import (
        RopeSpec, decode_attention_write_packed)

    rng = np.random.default_rng(100 + n_pos + window + post_qk)
    cache_p = _prefilled(rng, kind, n_pos)
    cache_u = cache_p.copy()
    q = jnp.asarray(rng.normal(0, 1, (B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    positions = jnp.full((B, 1), n_pos, jnp.int32)
    inv_ts = jnp.asarray(ops.create_inv_timescale(D, post_qk == 1))
    kn = qn = None
    if with_norms:
        kn = jnp.asarray(rng.normal(0, 0.1, (D,)).astype(np.float32))
        qn = jnp.asarray(rng.normal(0, 0.1, (D,)).astype(np.float32))
    spec = RopeSpec(inv_ts, post_qk, 0.0883883476, key_norm=kn,
                    query_norm=qn)

    want, cache_u = decode_attention_write(
        cache_u, 0, q, positions, k, v, window, att_cap=50.0, rope=spec,
        use_pallas=True, interpret=True)
    want = np.asarray(want.reshape(B, H * D).astype(jnp.bfloat16),
                      np.float32)

    qkv_row = _packed_row(rng, q, k, v)
    got, cache_p = decode_attention_write_packed(
        cache_p, 0, qkv_row, positions, window, heads=H, att_cap=50.0,
        rope=spec, use_pallas=True, interpret=True)
    assert got.dtype == jnp.bfloat16 and got.shape == (B, H * D)
    got = np.asarray(got, np.float32)

    # Per-row math is identical ([1, D] matvecs vs [G, D] dots differ
    # only by MXU row independence); allow 1-bf16-ulp on the cast output.
    np.testing.assert_allclose(got, want, rtol=8e-3, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cache_p.kv),
                                  np.asarray(cache_u.kv))
    if kind == "i8":
        np.testing.assert_allclose(np.asarray(cache_p.kv_scale),
                                   np.asarray(cache_u.kv_scale), rtol=1e-6)


def test_packed_valid_mask_and_fallback():
    """Masked slots write only the garbage row through the packed kernel;
    the use_pallas=False fallback (host slicing + composed pair) returns
    the same values the packed kernel does."""
    from gemma_tpu.ops import ops
    from gemma_tpu.ops.decode_attention import (
        RopeSpec, decode_attention_write_packed)

    rng = np.random.default_rng(33)
    n_pos = 24
    cache_p = _prefilled(rng, "i8", n_pos)
    cache_f = cache_p.copy()
    q = jnp.asarray(rng.normal(0, 1, (B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, 1, KVH, D)).astype(np.float32))
    positions = jnp.full((B, 1), n_pos, jnp.int32)
    valid = jnp.asarray([[True], [False]])
    spec = RopeSpec(jnp.asarray(ops.create_inv_timescale(D, False)), 0,
                    0.0625)
    qkv_row = _packed_row(rng, q, k, v)

    got, cache_p = decode_attention_write_packed(
        cache_p, 0, qkv_row, positions, SEQ, heads=H, att_cap=50.0,
        valid=valid, rope=spec, use_pallas=True, interpret=True)
    ref, cache_f = decode_attention_write_packed(
        cache_f, 0, qkv_row, positions, SEQ, heads=H, att_cap=50.0,
        valid=valid, rope=spec, use_pallas=False)
    # Valid slot matches the composed fallback; masked slot's output is
    # unspecified but no real ring row may be clobbered.
    np.testing.assert_allclose(np.asarray(got, np.float32)[0],
                               np.asarray(ref, np.float32)[0],
                               rtol=8e-3, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(cache_p.kv)[:, :, :, :, :SEQ],
        np.asarray(cache_f.kv)[:, :, :, :, :SEQ])
