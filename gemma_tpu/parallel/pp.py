"""Pipeline-parallel decode: layers sharded into stages over the mesh.

The reference runs every layer on one node (gemma/gemma.cc:83-116).  For
models past one chip's weight memory the alternatives are TP
(parallel/tp.py: 2 collectives per LAYER — ideal over ICI) and this
module's pipeline: each chip holds a contiguous block of layers (stacked
weight leaves sharded on their layer dim) plus that block's KV slice,
and hidden states hop stage-to-stage on ONE `ppermute` per microbatch
per step.  Communication per decode step is n_stages-1 hops of
[B_micro, D] — independent of layer count and far below TP's per-layer
psums, which is what makes PP the right axis across DCN (multi-host)
while TP rides ICI within a host.

Microbatching hides the pipeline bubble: B queries split into m
microbatches; a decode step runs m + n_stages - 1 ticks, each chip busy
on a different microbatch (utilization m / (m + n - 1)).

Layer-sharded state: the cache must be a single uniform pool
(KVCache.create(split_local=False)) so its layer dim shards evenly;
per-layer attention metadata (window sizes, RoPE timescales) rides in
[L]-leading arrays sharded the same way, so every in-stage index is
static.  Layer math is parallel/stack.py:apply_layer — the same one
copy SP/CP use; attention within a stage reuses parallel/cp.py's
resident-block machinery with no collectives.

Numerics: the composed layer path (bit-identical GEMMs to SP/CP; the
dense decode's fused prologue/epilogue path differs by ~1 bf16 ulp —
tests compare PP to the CP single-chip step bit-strictly and to the
dense step within the measured cliff bound).

Prefill: run it on whichever path fits (dense engine, TP, or SP for
long prompts) with a uniform-pool cache, then `shard_cache_pp` reshards
the finished cache onto the stage layout — PP itself only decodes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from gemma_tpu.models.configs import ModelConfig
from gemma_tpu.models.gemma import Params, _absolute_pe, embed_tokens
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.ops import ops
from gemma_tpu.ops.matmul import QuantTensor, matmul
from gemma_tpu.ops.ops import soft_cap
from gemma_tpu.parallel.cp import _attend_merge, _local_mask, _write_rows
from gemma_tpu.parallel.stack import apply_layer, rope_timescales


def _fold_scale(qt):
    """Fold a per-tensor scale into the weight array where that is exact
    enough (f32: exact; bf16: one extra rounding), so layers with
    differing scales share QuantTensor aux and can stack."""
    if not isinstance(qt, QuantTensor) or qt.scale == 1.0:
        return qt
    if qt.kind in ("f32", "bf16"):
        w = qt.arrays["w"]
        w = (w.astype(jnp.float32) * jnp.float32(qt.scale)).astype(w.dtype)
        return QuantTensor(qt.kind, qt.shape, 1.0, {"w": w}, qt.flags)
    return qt


def stack_layers(params: Params):
    """Stack the per-layer pytrees into [L, ...]-leading leaves.

    QuantTensor aux (kind, logical shape, scale) must match across
    layers; f32/bf16 per-tensor scales are folded into the weights
    first.  Quantized codecs whose per-tensor scales differ per layer
    cannot stack losslessly — load with `--kind i8` / `--kind i4` (the
    transcodes re-encode with group scales and aux scale 1.0)."""
    is_qt = lambda x: isinstance(x, QuantTensor)  # noqa: E731
    layers = [jax.tree.map(_fold_scale, l, is_leaf=is_qt)
              for l in params.layers]
    t0 = jax.tree_util.tree_structure(layers[0])
    for i, l in enumerate(layers[1:], 1):
        if jax.tree_util.tree_structure(l) != t0:
            raise ValueError(
                f"layer {i}'s pytree aux differs from layer 0's (per-"
                "tensor codec scales or layout flags): PP needs uniform "
                "stackable layers — load with --kind i8 or --kind i4, "
                "whose transcodes normalize scales into group arrays")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def pp_layer_specs(stacked, axis: str = "model"):
    """Specs sharding every stacked leaf on its leading (layer) dim."""
    return jax.tree.map(lambda _: P(axis), stacked)


def shard_cache_pp(cache: KVCache, mesh, axis: str = "model") -> KVCache:
    """Place a uniform-pool KVCache with the LAYER dim sharded."""
    if cache.layer_map:
        raise ValueError(
            "PP shards the cache on its layer dim: create it with "
            "split_local=False (uniform pool)")
    n = mesh.shape[axis]
    if cache.kv.shape[1] % n:
        raise ValueError(
            f"{cache.kv.shape[1]} layers do not divide over {n} stages")
    spec = P(None, axis)
    leaves = [cache.kv] + ([cache.kv_scale] if cache.quantized else [])
    specs = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(cache),
        [spec] * len(leaves))
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, specs)


def _uniform_layer_config(config: ModelConfig):
    lcs = config.layer_configs
    first = lcs[0]
    for lc in lcs[1:]:
        if (lc.heads, lc.kv_heads, lc.qkv_dim, lc.ff_hidden_dim,
                lc.post_norm, lc.post_qk, lc.use_qk_norm) != (
                first.heads, first.kv_heads, first.qkv_dim,
                first.ff_hidden_dim, first.post_norm, first.post_qk,
                first.use_qk_norm):
            raise ValueError("PP v1 requires uniform layer configs")
    return first


def _pp_decode_local(stage_layers, embedding, final_norm, windows_stage,
                     ts_stage, tokens, positions, cache: KVCache, *,
                     config: ModelConfig, axis: str, n_micro: int) -> tuple:
    """shard_map body: one decode step for all B queries, pipelined as
    n_micro microbatches across the stages.  Per-chip state: Ls stacked
    layers, the cache's [B, Ls, ...] pool slice, per-layer windows [Ls]
    and RoPE timescales [Ls, ...]."""
    b, t = tokens.shape
    assert t == 1, "PP decode is one token per query per step"
    m = n_micro
    assert b % m == 0, (
        f"batch {b} must divide into {m} microbatches — queries past "
        f"m*floor(b/m) would silently get garbage logits")
    n = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    quant = cache.quantized
    bm = b // m
    model_dim = config.model_dim
    ls = windows_stage.shape[0]

    kv, kv_scale = cache.kv, cache.kv_scale
    ring = cache.seq_len
    query_scale = config.query_scale_value()

    x_buf = jnp.zeros((b, model_dim), jnp.float32)
    h = jnp.zeros((bm, 1, model_dim), jnp.float32)
    perm = [(i, i + 1) for i in range(n - 1)]
    n_active = jnp.int32(0)  # this chip's busy ticks (utilization meter)

    def stage_compute(h, kv, kv_scale, pos_mb, start):
        """This stage's Ls layers on one microbatch (active ticks)."""
        rows = (pos_mb[:, 0] % ring).astype(jnp.int32)
        x = h

        for i in range(ls):
            layer = jax.tree.map(lambda a, _i=i: a[_i], stage_layers)
            window = windows_stage[i]
            ts = ts_stage[i]

            def attend(layer_idx, lci, q, k, v, _i=i, _w=window):
                nonlocal kv, kv_scale
                # Write the microbatch's row into MY pool slice at the
                # traced B offset.
                pool_mb = jax.lax.dynamic_slice_in_dim(kv, start, bm, 0)
                sc_mb = (jax.lax.dynamic_slice_in_dim(kv_scale, start,
                                                      bm, 0)
                         if quant else None)
                ok = jnp.ones((bm,), bool)
                pool_mb, sc_mb = _write_rows(pool_mb, sc_mb, _i, rows, ok,
                                             k, v, quant)
                kv = jax.lax.dynamic_update_slice_in_dim(kv, pool_mb,
                                                         start, 0)
                if quant:
                    kv_scale = jax.lax.dynamic_update_slice_in_dim(
                        kv_scale, sc_mb, start, 0)
                mask = _local_mask(pos_mb, ring, _w, 0, kv.shape[4])
                return _attend_merge(
                    q, pool_mb[:, _i, 0], pool_mb[:, _i, 1], mask,
                    config.att_cap, None,
                    scale_k=(sc_mb[:, _i, 0, :, 0] if quant else None),
                    scale_v=(sc_mb[:, _i, 1, :, 0] if quant else None))

            x = apply_layer(layer, 0, x, pos_mb, config=config,
                            inv_ts=ts, inv_ts_g=None,
                            query_scale=query_scale, attend=attend)
        return (x, kv) + ((kv_scale,) if quant else ())

    for tick in range(m + n - 1):
        # Stage 0 ingests microbatch `tick`; others receive from the left.
        h_prev = jax.lax.ppermute(h, axis, perm)
        if tick < m:
            mb = embed_tokens(embedding,
                              tokens[tick * bm:(tick + 1) * bm], model_dim)
            if config.absolute_pe:
                mb = mb + _absolute_pe(
                    positions[tick * bm:(tick + 1) * bm], model_dim)
        else:
            mb = jnp.zeros_like(h)
        h = jnp.where(me == 0, mb, h_prev)

        mu = tick - me                       # this chip's microbatch index
        active = (mu >= 0) & (mu < m)
        n_active = n_active + active.astype(jnp.int32)
        start = jnp.clip(mu * bm, 0, b - bm)
        pos_mb = jax.lax.dynamic_slice_in_dim(positions, start, bm, 0)

        # Pipeline-bubble ticks skip the whole stage (no pool
        # read-modify-write traffic, no GEMMs): lax.cond on the per-chip
        # scalar is a real branch inside shard_map.
        ops_in = (h, kv) + ((kv_scale,) if quant else ())
        out = jax.lax.cond(
            active,
            lambda o: stage_compute(o[0], o[1],
                                    o[2] if quant else None, pos_mb, start),
            lambda o: o,
            ops_in)
        x, kv = out[0], out[1]
        if quant:
            kv_scale = out[2]
        h = x

        # Last stage banks the finished microbatch's hidden row.
        done = active & (me == n - 1)
        cur = jax.lax.dynamic_slice_in_dim(x_buf, start, bm, 0)
        upd = jnp.where(done, x[:, -1, :], cur)
        x_buf = jax.lax.dynamic_update_slice_in_dim(x_buf, upd, start, 0)

    # Only the last stage wrote x_buf; psum broadcasts it (others are 0).
    x_buf = jax.lax.psum(jnp.where(me == n - 1, x_buf, 0.0), axis)
    x_bf = ops.rms_norm(x_buf, final_norm).astype(jnp.bfloat16)
    logits = matmul(x_bf, embedding, out_dtype=jnp.float32)
    if config.final_cap:
        logits = soft_cap(config.final_cap, logits)
    # Measured pipeline utilization: busy chip-ticks summed over stages /
    # total chip-ticks — the tick-counted (not just stated) m/(m+n-1).
    busy = jax.lax.psum(n_active, axis)
    return logits, kv, kv_scale, busy


def build_pp_decode(config: ModelConfig, mesh, cache: KVCache,
                    n_micro: int | None = None, axis: str = "model",
                    with_ticks: bool = False):
    """Jitted (stacked_layers, embedding, final_norm, tokens [B,1],
    positions [B,1], cache) -> (logits [B, vocab], cache) with layers and
    the cache's layer dim sharded into pipeline stages.

    Use `stack_layers(params)` + device_put with `pp_layer_specs` (or let
    jit reshard) for the weights; `shard_cache_pp` for the cache.
    n_micro defaults to the stage count (full pipelining when B divides).
    with_ticks appends the measured busy-tick count (utilization =
    busy / (n_stages * (m + n - 1))) to the outputs.
    """
    return _build(config, mesh, cache, n_micro, axis, k=None,
                  with_ticks=with_ticks)


def build_pp_decode_chunk(config: ModelConfig, mesh, cache: KVCache,
                          k: int, n_micro: int | None = None,
                          axis: str = "model"):
    """Greedy-decode k tokens inside ONE executable (the PP analog of
    build_cp_decode_chunk: pools round-trip device memory once per chunk,
    one host dispatch per k steps; each step still pipelines its
    microbatches through the stages).

    Jitted (stacked_layers, embedding, final_norm, tokens [B,1],
    positions [B,1], cache) -> (tokens [B, k] i32, cache)."""
    return _build(config, mesh, cache, n_micro, axis, k=k)


def _build(config, mesh, cache, n_micro, axis, k, with_ticks=False):
    """Shared builder: k=None -> single step returning logits; k=int ->
    greedy scan returning [B, k] tokens."""
    n = mesh.shape[axis]
    L = len(config.layer_configs)
    if L % n:
        raise ValueError(f"{L} layers do not divide over {n} stages")
    _uniform_layer_config(config)
    m = n_micro or n

    windows = jnp.asarray(config.attention_window_sizes, jnp.int32)
    inv_ts, inv_ts_g, _ = rope_timescales(config)
    ts_all = jnp.stack([
        inv_ts_g if (config.is_global_layer(i) and inv_ts_g is not None)
        else inv_ts
        for i in range(L)])
    body = functools.partial(_pp_decode_local, config=config, axis=axis,
                             n_micro=m)
    cache_sp = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(cache),
        [P(None, axis)] * (2 if cache.quantized else 1))

    def one_step(stage_layers, embedding, final_norm, windows_a, ts_a,
                 tok, pos, c):
        logits, kv, kv_scale, busy = body(stage_layers, embedding,
                                          final_norm, windows_a, ts_a,
                                          tok, pos, c)
        return (logits, dataclasses.replace(c, kv=kv, kv_scale=kv_scale),
                busy)

    if k is None:
        if with_ticks:
            def wrapped(stage_layers, embedding, final_norm, windows_a,
                        ts_a, tok, pos, c):
                logits, c, busy = one_step(stage_layers, embedding,
                                           final_norm, windows_a, ts_a,
                                           tok, pos, c)
                return logits, c, busy
        else:
            def wrapped(stage_layers, embedding, final_norm, windows_a,
                        ts_a, tok, pos, c):
                logits, c, _ = one_step(stage_layers, embedding,
                                        final_norm, windows_a, ts_a,
                                        tok, pos, c)
                return logits, c
    else:
        def wrapped(stage_layers, embedding, final_norm, windows_a, ts_a,
                    tokens, positions, c):
            def step(carry, _):
                tok, pos, cc = carry
                logits, cc, _ = one_step(stage_layers, embedding,
                                         final_norm, windows_a, ts_a,
                                         tok, pos, cc)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
                return (nxt, pos + 1, cc), nxt[:, 0]

            (_, _, c), toks = jax.lax.scan(
                step, (tokens, positions, c), None, length=k)
            return toks.swapaxes(0, 1), c

    # P(axis) is a PREFIX spec for the whole stacked-layers pytree:
    # every leaf shards its leading (layer) dim into stages.
    out_specs = (P(), cache_sp, P()) if (k is None and with_ticks) \
        else (P(), cache_sp)
    fn = jax.shard_map(
        wrapped, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(axis), P(axis), P(), P(), cache_sp),
        out_specs=out_specs,
        check_vma=False)
    jitted = jax.jit(fn, donate_argnums=(7,))

    def call(stage_layers, embedding, final_norm, tokens, positions, c):
        return jitted(stage_layers, embedding, final_norm, windows, ts_all,
                      tokens, positions, c)

    return call
