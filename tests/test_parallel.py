"""Tensor-parallel forward vs the single-device forward (8 CPU devices).

The oracle is the already-oracle-verified models/gemma.py forward: the TP
path must produce identical logits (up to collective reduction order) on a
2x4 (data x model) mesh.
"""

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
from gemma_tpu.parallel import (
    build_tp_step,
    make_mesh,
    pick_mesh_shape,
    shard_cache,
    shard_params,
)
from gemma_tpu.utils.synth import synth_params


def tp_config(num_layers=2, window=None):
    model_dim, heads, kv_heads, qkv_dim, ff = 64, 8, 4, 32, 256
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
        vocab_size=512,
        max_seq_len=64,
        num_layers=num_layers,
        att_cap=50.0,
        final_cap=30.0,
        query_scale=QueryScaleType.SQRT_KEY_SIZE,
        weight=Type.F32,
    )
    c.layer_configs = [lc for _ in range(num_layers)]
    c.attention_window_sizes = [window or c.max_seq_len] * num_layers
    return c


def test_pick_mesh_shape():
    c = tp_config()
    assert pick_mesh_shape(8, c) == (2, 4)
    assert pick_mesh_shape(4, c) == (1, 4)
    assert pick_mesh_shape(1, c) == (1, 1)


@pytest.mark.parametrize("kind", ["f32", "sfp"])
def test_tp_matches_single_device(kind):
    config = tp_config()
    params = synth_params(config, kind=kind, seed=3)
    batch, t, seq_len = 4, 8, 32

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, config.vocab_size, (batch, t)).astype(np.int32)
    positions = np.tile(np.arange(t, dtype=np.int32), (batch, 1))
    valid = np.ones((batch, t), bool)
    prefix_end = np.zeros((batch,), np.int32)

    # Single-device reference.
    cache = KVCache.create(config, batch, seq_len)
    ref_logits, ref_cache = forward(
        params, jnp.asarray(tokens), jnp.asarray(positions), cache, config,
        return_logits="last", valid=jnp.asarray(valid),
    )

    # Sharded run on the 2x4 mesh.
    mesh = make_mesh(8, config)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    p_sh = shard_params(params, config, mesh)
    kv_sh = shard_cache(KVCache.create(config, batch, seq_len), mesh)
    step = build_tp_step(p_sh, config, mesh, return_logits="last", seq_len=seq_len)
    tp_logits, tp_cache = step(
        p_sh, jnp.asarray(tokens), jnp.asarray(positions),
        jnp.asarray(valid), jnp.asarray(prefix_end), kv_sh,
    )
    tp_kv = tp_cache.kv

    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    # bf16 cache: allow one-ulp rounding differences from reduction order.
    np.testing.assert_allclose(
        np.asarray(tp_kv), np.asarray(ref_cache.kv), rtol=1e-2, atol=1e-4
    )


def test_tp_decode_after_prefill():
    """Prefill then one decode step, all sharded; vs single-device."""
    config = tp_config(num_layers=1, window=16)
    params = synth_params(config, kind="f32", seed=7)
    batch, t, seq_len = 2, 6, 32

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, config.vocab_size, (batch, t)).astype(np.int32)
    positions = np.tile(np.arange(t, dtype=np.int32), (batch, 1))
    valid = np.ones((batch, t), bool)
    pe = np.zeros((batch,), np.int32)

    cache = KVCache.create(config, batch, seq_len)
    _, cache = forward(params, jnp.asarray(tokens), jnp.asarray(positions),
                       cache, config, return_logits="none",
                       valid=jnp.asarray(valid))
    next_tok = tokens[:, -1:] * 0 + 5
    next_pos = np.full((batch, 1), t, np.int32)
    ref_logits, _ = forward(params, jnp.asarray(next_tok),
                            jnp.asarray(next_pos), cache, config,
                            return_logits="last")

    mesh = make_mesh(8, config)
    p_sh = shard_params(params, config, mesh)
    kv = shard_cache(KVCache.create(config, batch, seq_len), mesh)
    prefill = build_tp_step(p_sh, config, mesh, return_logits="none", seq_len=seq_len)
    decode = build_tp_step(p_sh, config, mesh, return_logits="last", seq_len=seq_len)
    kv = prefill(p_sh, jnp.asarray(tokens), jnp.asarray(positions),
                 jnp.asarray(valid), jnp.asarray(pe), kv)
    tp_logits, _ = decode(p_sh, jnp.asarray(next_tok), jnp.asarray(next_pos),
                          jnp.ones((batch, 1), bool), jnp.asarray(pe), kv)
    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_overlap_chunked_psum_bitexact():
    """overlap_chunks splits reduced matmuls into N-chunks with one psum
    each (VERDICT r1 weak #4); outputs must be bit-identical to the
    single-psum schedule (same dots, same single reduction per element)."""
    import jax.numpy as jnp
    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.parallel import (build_tp_step, make_mesh, shard_cache,
                                    shard_params)
    from gemma_tpu.utils.synth import synth_params

    config = tp_config(num_layers=2)
    params = synth_params(config, kind="f32", seed=13)
    mesh = make_mesh(8, config)
    p_sh = shard_params(params, config, mesh)
    batch, t, seq = 4, 8, 64
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, config.vocab_size, (batch, t)).astype(np.int32))
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (batch, 1))
    valid = jnp.ones((batch, t), bool)
    pe = jnp.zeros((batch,), jnp.int32)

    outs = []
    for chunks in (1, 4):
        cache = shard_cache(KVCache.create(config, batch, seq), mesh)
        step = build_tp_step(p_sh, config, mesh, return_logits="last",
                             overlap_chunks=chunks)
        logits, _ = step(p_sh, tokens, positions, valid, pe, cache)
        outs.append(np.asarray(logits))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_nuq4_col_shard_table_alignment():
    """Code-review r2: equal col-shard slices of the lane-padded nuq4
    tables misalign whenever (G/tp) % 8 != 0.  shard_params re-lays them
    per shard; each shard's slice must decode its own K-range exactly."""
    import jax.numpy as jnp
    from gemma_tpu.ops.matmul import QuantTensor, _unpack_nuq4
    from gemma_tpu.parallel.tp import _localize, _pad_tables_for_col_shard
    from gemma_tpu.utils.synth import synth_quant

    rng = np.random.default_rng(31)
    n, k, tp = 8, 5120, 2  # G=20, G/tp=10 -> 10 % 8 != 0 (the bad case)
    qt = synth_quant(rng, n, k, "nuq4")
    dense = np.asarray(qt.dequantize())

    padded = _pad_tables_for_col_shard(qt, tp)
    tl = padded.arrays["tables"].shape[1]
    assert tl % tp == 0
    kl = k // tp
    for i in range(tp):
        # Exactly what shard_map's equal slicing hands each chip:
        codes_l = padded.arrays["codes"][:, i * kl // 2 : (i + 1) * kl // 2]
        tables_l = padded.arrays["tables"][:, i * tl // tp : (i + 1) * tl // tp]
        local = _localize(QuantTensor("nuq4", (n, k), qt.scale,
                                      {"codes": codes_l,
                                       "tables": tables_l}))
        assert local.k == kl
        got = np.asarray(local.dequantize())
        np.testing.assert_array_equal(got, dense[:, i * kl : (i + 1) * kl])


def test_ring_reduce_matches_psum():
    """The ppermute ring all-reduce (async, overlappable on TPU — see
    scripts/overlap_hlo.py) must agree with the psum path (different
    accumulation order, so allclose not bit-equal)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from gemma_tpu.parallel.mesh import make_mesh
    from gemma_tpu.parallel.tp import _ring_allreduce

    mesh = make_mesh(8, data=1, model=8)
    rng = np.random.default_rng(40)
    x = jnp.asarray(rng.normal(0, 1, (8, 16, 128)).astype(np.float32))

    def body(x):
        local = x[0]  # [16, 128] per-shard partial
        return _ring_allreduce(local, 8), jax.lax.psum(local, "model")

    ring, ps = jax.shard_map(
        body, mesh=mesh, in_specs=P("model", None, None),
        out_specs=(P(), P()), check_vma=False)(x)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(ps),
                               rtol=1e-5, atol=1e-5)


def test_tp_step_ring_reduce_matches_default():
    """build_tp_step(ring_reduce=True) stays numerically consistent with
    the default psum path end-to-end."""
    import jax.numpy as jnp

    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.parallel import (build_tp_step, make_mesh, shard_cache,
                                    shard_params)
    from gemma_tpu.utils.synth import synth_params
    from tests.test_parity_full import gemma2_shaped_config

    config = gemma2_shaped_config(num_layers=2)
    mesh = make_mesh(8, data=2, model=4)
    params = shard_params(synth_params(config, kind="sfp", seed=11),
                          config, mesh)
    batch, t, seq = 4, 8, 64
    rng = np.random.default_rng(41)
    tokens = jnp.asarray(
        rng.integers(2, config.vocab_size, (batch, t)).astype(np.int32))
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32), (batch, 1))
    valid = jnp.ones((batch, t), bool)
    pe = jnp.zeros((batch,), jnp.int32)

    outs = []
    for ring in (False, True):
        cache = shard_cache(KVCache.create(config, batch, seq), mesh)
        step = build_tp_step(params, config, mesh, return_logits="last",
                             overlap_chunks=4, ring_reduce=ring)
        logits, _ = step(params, tokens, pos, valid, pe, cache)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(outs[1], outs[0], rtol=5e-4, atol=5e-4)


def test_sharded_tables_dequantize_raises():
    """The re-laid (per-shard) nuq4 table layout is kernel-only; host
    dequantize() must refuse instead of decoding garbage (advisor r2)."""
    import pytest as pt

    from gemma_tpu.parallel.tp import _pad_tables_for_col_shard
    from gemma_tpu.utils.synth import synth_quant

    rng = np.random.default_rng(33)
    qt = synth_quant(rng, 8, 5120, "nuq4")
    padded = _pad_tables_for_col_shard(qt, 2)
    assert "sharded_tables" in padded.flags
    with pt.raises(ValueError, match="column shard"):
        padded.dequantize()


def test_tp_step_fused_heads():
    """build_tp_step return_logits='top1'/'topk' (+mask) vs single-device.

    The fused heads were previously reachable only through
    build_tp_decode_chunk; the public step builder must plumb the same
    out_specs / top_k_n / mask inputs."""
    config = tp_config()
    params = synth_params(config, kind="f32", seed=5)
    batch, t, seq_len = 4, 6, 32

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, config.vocab_size, (batch, t)).astype(np.int32)
    positions = np.tile(np.arange(t, dtype=np.int32), (batch, 1))
    valid = np.ones((batch, t), bool)
    pe = np.zeros((batch,), np.int32)
    mask = np.zeros((config.vocab_size,), bool)
    mask[:37] = True  # shard 0 only: exercises fully-masked-shard merges

    cache = KVCache.create(config, batch, seq_len)
    (ref_tok, ref_prob), _ = forward(
        params, jnp.asarray(tokens), jnp.asarray(positions), cache, config,
        return_logits="top1", valid=jnp.asarray(valid))
    cache = KVCache.create(config, batch, seq_len)
    (ref_vals, ref_idx), _ = forward(
        params, jnp.asarray(tokens), jnp.asarray(positions), cache, config,
        return_logits="topk", top_k_n=4, valid=jnp.asarray(valid),
        top1_mask=jnp.asarray(mask))

    mesh = make_mesh(8, config)
    p_sh = shard_params(params, config, mesh)

    top1 = build_tp_step(p_sh, config, mesh, return_logits="top1")
    kv = shard_cache(KVCache.create(config, batch, seq_len), mesh)
    (tok, prob), _ = top1(p_sh, jnp.asarray(tokens), jnp.asarray(positions),
                          jnp.asarray(valid), jnp.asarray(pe), kv)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    np.testing.assert_allclose(np.asarray(prob), np.asarray(ref_prob),
                               rtol=2e-4, atol=2e-5)

    topk = build_tp_step(p_sh, config, mesh, return_logits="topk",
                         top_k_n=4, with_mask=True)
    kv = shard_cache(KVCache.create(config, batch, seq_len), mesh)
    (vals, idxs), _ = topk(p_sh, jnp.asarray(tokens), jnp.asarray(positions),
                           jnp.asarray(valid), jnp.asarray(pe), kv,
                           jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=2e-4, atol=2e-4)

    with pytest.raises(ValueError):
        build_tp_step(p_sh, config, mesh, return_logits="topk")
