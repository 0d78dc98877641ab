"""Context-parallel decode: the global-layer KV cache sharded over ICI.

The reference caps context at one node's memory (gemma/kv_cache.h:28-57:
one ring buffer per query, seq_len rows, resident on the host).  This
module supplies the TPU-native extension BASELINE.md names ("weights and
KV-cache ... sharded over ICI"): for contexts whose GLOBAL-layer KV no
longer fits one chip, shard each global pool's ring dimension
block-contiguously over the mesh axis and run decode attention as one
partial online-softmax per chip plus an O(B*H*D) log-sum-exp merge
(`pmax` of the row maxima, `psum` of the partial numerators/denominators)
— the collective payload is independent of context length.

Sliding-window pools stay replicated: they are window-sized by design
(models/kv_cache.py shrinks them ~8x for Gemma3), so sharding them would
save little and cost a merge per local layer.  Weights are replicated in
this v1 — CP trades nothing for capacity on the KV side; composing CP
with Megatron TP (heads on a second mesh axis) is the production layout
for weight-bound models and is left to `parallel/tp.py`'s axis.

Numerics mirror the dense decode fallback (ops/attention.py) except the
probability normalization order: the fallback normalizes (and, for
narrow caches, rounds probs to the cache dtype) before the PV dot, which
a distributed merge cannot reproduce — f32 caches match to reduction
reorder (~1e-6); bf16/i8 caches carry the same bounded drift as
parallel/ring_attention.py (tests/test_cp.py).

Handoff: `shard_cache_cp` places a standard KVCache on the mesh (use it
on the cache returned by `parallel/sp.py:scatter_into_cache` for the
long-context prefill -> decode chain).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from gemma_tpu.models.configs import ModelConfig
from gemma_tpu.models.gemma import Params
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.ops import ops
from gemma_tpu.ops.attention import NEG_INF
from gemma_tpu.ops.matmul import matmul
from gemma_tpu.ops.ops import soft_cap
from gemma_tpu.parallel.stack import stack_forward


def cache_specs(cache: KVCache, axis: str = "model"):
    """A KVCache-shaped pytree of PartitionSpecs: global pools sharded on
    their ring dim, local pools replicated.  Specs are assigned
    positionally from KVCache.tree_flatten's fixed child order
    [kv, kv_local, kv_scale, kv_local_scale]."""
    kv_spec = P(None, None, None, None, axis, None)
    sc_spec = P(None, None, None, None, None, axis)
    children = [cache.kv, cache.kv_local, cache.kv_scale,
                cache.kv_local_scale]
    order = [kv_spec, P(), sc_spec, P()]
    leaves = [s for c, s in zip(children, order) if c is not None]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(cache), leaves)


def shard_cache_cp(cache: KVCache, mesh, axis: str = "model") -> KVCache:
    """Place a KVCache on the mesh with the global ring dim sharded.

    Requires the ring allocation (kv.shape[4]) to divide by the axis
    size.  KVCache.create pads rings to sublane tiles (16 for bf16, 32
    for i8), so round_up(seq_len + 1, tile) must be a multiple of the
    axis size — true for every power-of-two seq_len >= 1024 on an
    8-chip axis.
    """
    n = mesh.shape[axis]
    s_alloc = cache.kv.shape[4]
    if s_alloc % n:
        raise ValueError(
            f"global ring alloc {s_alloc} does not divide over {n} chips; "
            f"pick a seq_len whose padded ring is a multiple of {n}")
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, cache_specs(cache, axis))


def _local_mask(positions, ring, window, base, s_loc):
    """attention_mask (ops/attention.py) restricted to rows
    [base, base + s_loc): O(s_loc) per chip instead of building the full
    O(ring) mask and slicing.  positions: [B, T]; prefix_end is 0 (decode).
    Rows past the ring (padding/garbage) are invalid."""
    s_idx = base + jnp.arange(s_loc, dtype=jnp.int32)          # [s_loc]
    q = positions.astype(jnp.int32)                            # [B, T]
    newest = jnp.max(q, axis=-1)                               # [B]
    key_abs = newest[:, None] - (
        (newest[:, None] % ring - s_idx[None, :]) % ring)      # [B, s_loc]
    start = q - jnp.minimum(jnp.int32(window - 1), q)          # [B, T]
    ok = ((key_abs[:, None, :] >= start[..., None])
          & (key_abs[:, None, :] <= q[..., None])
          & (key_abs[:, None, :] >= 0))
    return ok & (s_idx < ring)[None, None, :]


def _attend_merge(q, k_loc, v_loc, mask_loc, att_cap, axis,
                  scale_k=None, scale_v=None):
    """Partial online softmax over the resident KV block + cross-shard
    log-sum-exp merge.  q: [B, T, H, D] f32 (RoPE'd, scaled); k_loc/v_loc:
    [B, KH, s_loc, D] (raw codes when scales given); mask_loc:
    [B, T, s_loc].  axis=None runs the same math with no collectives
    (replicated local-window pools)."""
    b, t, heads, d = q.shape
    kvh = k_loc.shape[1]
    groups = heads // kvh
    # Round q to the dot's MXU input dtype: f32 caches keep f32; bf16
    # and i8 caches dot at bf16 (i8 codes are exact in bf16) — matching
    # ops/attention.py's fallbacks.
    cdt = jnp.float32 if k_loc.dtype == jnp.float32 else jnp.bfloat16
    qg = (q.reshape(b, t, kvh, groups, d).astype(cdt)
          .astype(jnp.float32))
    scores = jnp.einsum("btkgd,bksd->btkgs", qg,
                        k_loc.astype(jnp.float32))
    if scale_k is not None:
        scores = scores * scale_k[:, None, :, None, :]
    if att_cap:
        scores = soft_cap(att_cap, scores)
    scores = jnp.where(mask_loc[:, :, None, None, :], scores, NEG_INF)
    m_i = jnp.max(scores, axis=-1, keepdims=True)
    m = jax.lax.pmax(m_i, axis) if axis else m_i
    e = jnp.exp(scores - m)
    ev = e
    if scale_v is not None:
        ev = e * scale_v[:, None, :, None, :]
    l_i = jnp.sum(e, axis=-1, keepdims=True)
    o_i = jnp.einsum("btkgs,bksd->btkgd", ev, v_loc.astype(jnp.float32))
    if axis:
        l_i = jax.lax.psum(l_i, axis)
        o_i = jax.lax.psum(o_i, axis)
    out = o_i / l_i
    return out.reshape(b, t, heads, d)


def _write_rows(pool_l, scale_l, idx, rows_local, ok, k, v, quantized):
    """Masked single-row KV write into the resident pool block.

    pool_l: [B, n_pool, 2, KH, s_loc, D]; rows_local: [B] local row (may
    be out of range when another shard owns it); ok: [B] this shard owns
    the row.  Non-owners rewrite the row's current contents (a no-op
    value-wise), keeping the scatter shape static."""
    s_loc = pool_l.shape[4]
    r = jnp.clip(rows_local, 0, s_loc - 1)
    kv_new = jnp.stack([k[:, 0], v[:, 0]], axis=1)  # [B, 2, KH, D]
    if quantized:
        from gemma_tpu.ops.kv_quant import quantize_rows

        codes, sc = quantize_rows(kv_new[:, :, :, None])  # B,2,H,1,D / B,2,H,1
        codes, sc = codes[:, :, :, 0], sc[..., 0]

        def per_q_s(sc_q, r_q, new_q, ok_q):
            cur = sc_q[:, :, 0, r_q]
            return sc_q.at[:, :, 0, r_q].set(jnp.where(ok_q, new_q, cur))

        scale_l = scale_l.at[:, idx].set(jax.vmap(per_q_s)(
            scale_l[:, idx], r, sc, ok))
        kv_new = codes

    def per_q(cache_q, r_q, new_q, ok_q):
        cur = cache_q[:, :, r_q]
        return cache_q.at[:, :, r_q].set(jnp.where(ok_q, new_q, cur))

    pool_l = pool_l.at[:, idx].set(jax.vmap(per_q)(
        pool_l[:, idx], r, kv_new.astype(pool_l.dtype), ok))
    return pool_l, scale_l


def _cp_decode_local(params: Params, tokens, positions, cache: KVCache, *,
                     config: ModelConfig, axis: str) -> tuple:
    """shard_map body: one decode step with the global pools' ring dim
    sharded over `axis`.  tokens/positions: [B, 1]; returns (logits
    [B, vocab] f32 replicated, updated cache leaves)."""
    b, t = tokens.shape
    # _write_rows writes exactly one row per query and the mask treats
    # max(positions) as newest — T > 1 would silently attend stale rows.
    assert t == 1, f"CP decode is one token per query per step, got T={t}"
    me = jax.lax.axis_index(axis)
    quant = cache.quantized

    kv, kv_local = cache.kv, cache.kv_local
    kv_scale, kv_local_scale = cache.kv_scale, cache.kv_local_scale
    s_loc = kv.shape[4]

    def attend(layer_idx, lci, q, k, v):
        nonlocal kv, kv_local, kv_scale, kv_local_scale
        local_pool, idx = (False, layer_idx)
        if cache.layer_map:
            local_pool, idx = cache.layer_map[layer_idx]
        ring = cache.seq_len_local if local_pool else cache.seq_len
        window = config.attention_window_sizes[layer_idx]
        rows = (positions[:, 0] % ring).astype(jnp.int32)  # [B]

        if local_pool:
            # Replicated window pool: every chip runs the identical
            # full-ring update + attention (no collectives).
            kv_local, kv_local_scale = _write_rows(
                kv_local, kv_local_scale, idx, rows,
                jnp.ones((b,), bool), k, v, quant)
            s_all = kv_local.shape[4]
            mask = _local_mask(positions, ring, window, 0, s_all)
            return _attend_merge(
                q, kv_local[:, idx, 0], kv_local[:, idx, 1], mask,
                config.att_cap, None,
                scale_k=(kv_local_scale[:, idx, 0, :, 0] if quant else None),
                scale_v=(kv_local_scale[:, idx, 1, :, 0] if quant else None))
        rows_local = rows - me * s_loc
        ok = (rows_local >= 0) & (rows_local < s_loc)
        kv, kv_scale = _write_rows(
            kv, kv_scale, idx, rows_local, ok, k, v, quant)
        # O(s_loc) mask for this shard's resident row block only.
        mask = _local_mask(positions, ring, window, me * s_loc, s_loc)
        return _attend_merge(
            q, kv[:, idx, 0], kv[:, idx, 1], mask,
            config.att_cap, axis,
            scale_k=(kv_scale[:, idx, 0, :, 0] if quant else None),
            scale_v=(kv_scale[:, idx, 1, :, 0] if quant else None))

    x = stack_forward(params, tokens, positions, config=config,
                      attend=attend)
    x_bf = ops.rms_norm(x[:, -1], params.final_norm).astype(jnp.bfloat16)
    logits = matmul(x_bf, params.embedding, out_dtype=jnp.float32)
    if config.final_cap:
        logits = soft_cap(config.final_cap, logits)
    return logits, kv, kv_local, kv_scale, kv_local_scale


def build_cp_decode_chunk(config: ModelConfig, mesh, cache: KVCache,
                          k: int, axis: str = "model"):
    """Greedy-decode k tokens inside ONE executable (the CP analog of the
    engine's decode_chunk: the KV pools round-trip device memory once per
    chunk and the host dispatches once per k steps).

    Jitted (params, tokens [B,1], positions [B,1], cache) ->
    (tokens [B, k] i32, cache).  The step's argmax feeds the next step;
    every shard computes the identical replicated argmax, so the scan
    needs no token collective."""
    specs = cache_specs(cache, axis)

    def body(params, tokens, positions, cache):
        def step(carry, _):
            tok, pos, c = carry
            logits, kv, kv_local, ks, kls = _cp_decode_local(
                params, tok, pos, c, config=config, axis=axis)
            c = dataclasses.replace(c, kv=kv, kv_local=kv_local,
                                    kv_scale=ks, kv_local_scale=kls)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            return (nxt, pos + 1, c), nxt[:, 0]

        (_, _, cache), toks = jax.lax.scan(
            step, (tokens, positions, cache), None, length=k)
        return toks.swapaxes(0, 1), cache

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), specs),
        out_specs=(P(), specs),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(3,))


def build_cp_decode(config: ModelConfig, mesh, cache: KVCache,
                    axis: str = "model"):
    """Jitted (params, tokens [B,1], positions [B,1], cache) ->
    (logits [B, vocab] f32, cache) with the cache's global pools sharded
    as `cache_specs` (use `shard_cache_cp` to place the cache first; the
    `cache` argument here only fixes the pytree structure/specs)."""
    specs = cache_specs(cache, axis)

    def body(params, tokens, positions, cache):
        logits, kv, kv_local, kv_scale, kv_local_scale = _cp_decode_local(
            params, tokens, positions, cache, config=config, axis=axis)
        new = dataclasses.replace(
            cache, kv=kv, kv_local=kv_local, kv_scale=kv_scale,
            kv_local_scale=kv_local_scale)
        return logits, new

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), specs),
        out_specs=(P(), specs),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(3,))
