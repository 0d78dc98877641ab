"""Sequence-parallel prefill: the full layer stack with T sharded over ICI.

The reference's only prefill scaling lever is token batching on one node
(gemma/gemma.cc:188-283, `prefill_tbatch_size`); its long-context story is
the interleaved local/global windows + ring KV cache (README.md:306-311).
SURVEY §5 names the TPU-native extension this module supplies: shard the
prefill SEQUENCE over the `model` axis so activation and attention memory
per chip drop n×, with KV blocks rotating on `ppermute` inside each
layer's attention (parallel/ring_attention.py).  Weights are replicated —
every GEMM is local and collective-free; the ring rotation is the only
communication and it overlaps with the blockwise attention compute.

Complements `parallel/tp.py` (head/vocab sharding, for decode and
weight-bound serving): SP is for the prefill of contexts too long for one
chip's activation + KV memory.  `scatter_into_cache` hands the per-layer
KV stacks to a standard (replicated or TP-sharded) `KVCache` for decode.

Numerics mirror `models/gemma.py:forward` (embedding scale bf16 rounding,
(1+w) RMSNorm, RoPE timescales, softcap, exact f32 softmax); K/V are
rounded to the cache dtype BEFORE attention, exactly like the dense
prefill which attends against cache contents (gemma/attention.cc:247-321
writes KV to the cache, then reads it back).  Image splicing (PaliGemma)
is not routed here — VLM image prefill is short; use the dense/TP path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gemma_tpu.models.configs import ModelConfig
from gemma_tpu.models.gemma import Params
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.parallel.ring_attention import _ring_attention_local
from gemma_tpu.parallel.stack import stack_forward


def _sp_forward_local(params: Params, tokens, positions, prefix_end, *,
                      config: ModelConfig, axis: str, kv_dtype) -> tuple:
    """shard_map body: tokens/positions are the local T-shard, params are
    replicated (full weights per chip).  Returns the final hidden state
    [B, Tl, D] plus per-layer K/V stacks [L, B, Tl, KH, qkv_dim] in
    kv_dtype (post key-norm + RoPE — the cache layout's contents).
    Layer math lives in parallel/stack.py; this body only defines what
    "attend" means: ring attention over `axis` + K/V stack collection."""
    ks, vs = [], []

    def attend(layer_idx, lci, q, k, v):
        # Round K/V to the cache dtype first: the dense prefill attends
        # against what the cache stores (attention.cc:247-321).
        k = k.astype(kv_dtype)
        v = v.astype(kv_dtype)
        ks.append(k)
        vs.append(v)
        window = config.attention_window_sizes[layer_idx]
        return _ring_attention_local(
            q, k, v, positions, positions, prefix_end,
            window=window, att_cap=config.att_cap, axis=axis)

    x = stack_forward(params, tokens, positions, config=config,
                      attend=attend)
    return x, jnp.stack(ks), jnp.stack(vs)


def build_sp_prefill(config: ModelConfig, mesh, axis: str = "model", *,
                     kv_dtype=jnp.bfloat16):
    """Jitted (params, tokens, positions, prefix_end) ->
    (x [B, T, D] f32, k [L, B, T, KH, qkv_dim], v [...]) with T sharded
    over `axis` in every output.

    T must divide by the axis size.  tokens/positions arrive [B, T]
    (sharded or host-replicated — jit reshards); prefix_end is [B]
    (prefix-LM bidirectional prefix, 0 = causal).  The last token's
    hidden row is x[:, -1] — feed it to the logits head of choice;
    `scatter_into_cache` writes the K/V stacks into a KVCache for decode.
    """
    body = functools.partial(
        _sp_forward_local, config=config, axis=axis, kv_dtype=kv_dtype)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P()),
        out_specs=(P(None, axis, None), P(None, None, axis, None, None),
                   P(None, None, axis, None, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def _scatter_into_cache(cache: KVCache, kstack, vstack, positions,
                        valid) -> KVCache:
    for layer_idx in range(kstack.shape[0]):
        # Drop positions older than the pool's ring: one XLA scatter with
        # duplicate row indices has UNDEFINED write order (CPU happens to
        # be last-wins, so the hermetic tests cannot catch it) — keep only
        # the newest position mapping to each ring row, exactly what ring
        # addressing retains.  Assumes prefill positions are consecutive
        # per query (the engine's contract).
        ring = cache.seq_for_layer(layer_idx)
        newest = jnp.max(positions, axis=-1, keepdims=True)
        live = positions > newest - ring
        v_l = live if valid is None else (valid & live)
        cache = cache.update(layer_idx, positions,
                             kstack[layer_idx].astype(jnp.float32),
                             vstack[layer_idx].astype(jnp.float32),
                             valid=v_l)
    return cache


_scatter_jit = jax.jit(_scatter_into_cache, donate_argnums=(0,))


def scatter_into_cache(cache: KVCache, kstack, vstack, positions,
                       valid=None) -> KVCache:
    """Write SP-prefill K/V stacks into a standard KVCache (ring rows,
    windowed pools, i8 quantization — whatever the cache kind does).

    kstack/vstack: [L, B, T, qkv_heads, qkv_dim] from build_sp_prefill
    (any sharding; XLA inserts the reshard).  Runs as ONE jitted,
    cache-donating executable: the L per-layer pool updates chain
    copy-free instead of materializing L full-cache copies + L dispatches
    (CLAUDE.md: only chains inside one executable are reliably
    copy-free).  Positions older than a pool's ring are routed to the
    garbage row so no scatter carries duplicate row indices."""
    return _scatter_jit(cache, kstack, vstack, positions, valid)
