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

from gemma_tpu.models.configs import ModelConfig, PostNormType, PostQKType
from gemma_tpu.models.gemma import (Params, _absolute_pe, _position_encode,
                                    embed_tokens)
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.ops import ops
from gemma_tpu.ops.matmul import gated_ffn, matmul
from gemma_tpu.parallel.ring_attention import _ring_attention_local


def _sp_forward_local(params: Params, tokens, positions, prefix_end, *,
                      config: ModelConfig, axis: str, kv_dtype) -> tuple:
    """shard_map body: tokens/positions are the local T-shard, params are
    replicated (full weights per chip).  Returns the final hidden state
    [B, Tl, D] plus per-layer K/V stacks [L, B, Tl, KH, qkv_dim] in
    kv_dtype (post key-norm + RoPE — the cache layout's contents)."""
    b, tl = tokens.shape
    model_dim = config.model_dim
    lc = config.layer_configs[0]

    x = embed_tokens(params.embedding, tokens, model_dim)
    if config.absolute_pe:
        x = x + _absolute_pe(positions, model_dim)

    half_rope = lc.post_qk == PostQKType.HALF_ROPE
    inv_ts = jnp.asarray(ops.create_inv_timescale(lc.qkv_dim, half_rope))
    from gemma_tpu.models.configs import is_vlm

    inv_ts_g = None
    if is_vlm(config.model):  # attention.cc:85-88 (model, not wrapping)
        inv_ts_g = jnp.asarray(ops.create_inv_timescale(
            lc.qkv_dim, half_rope, base_frequency=1e6))
    query_scale = config.query_scale_value()

    ks, vs = [], []
    for layer_idx, layer in enumerate(params.layers):
        lci = config.layer_configs[layer_idx]
        is_global = config.is_global_layer(layer_idx)
        ts = inv_ts_g if (is_global and inv_ts_g is not None) else inv_ts
        heads, kv_heads, qkv_dim = lci.heads, lci.kv_heads, lci.qkv_dim

        # --- attention: local QKV GEMMs, ring attention over `axis` ---
        a_in = ops.rms_norm(x, layer.pre_att_norm).reshape(
            b * tl, model_dim).astype(jnp.bfloat16)
        if layer.qkv_cat is not None:
            qkv_all = matmul(a_in, layer.qkv_cat, out_dtype=jnp.float32)
            q = qkv_all[:, : heads * qkv_dim]
            kv = qkv_all[:, heads * qkv_dim:]
        else:
            q = matmul(a_in, layer.qkv1, out_dtype=jnp.float32)
            kv = matmul(a_in, layer.qkv2, out_dtype=jnp.float32)
        q = q.reshape(b, tl, heads, qkv_dim)
        kv = kv.reshape(b, tl, kv_heads, 2, qkv_dim)
        k, v = kv[..., 0, :], kv[..., 1, :]

        if lci.use_qk_norm and layer.key_norm is not None:
            k = ops.rms_norm(k, layer.key_norm)
        k = _position_encode(k, positions, ts, 1.0, lci.post_qk)
        if lci.use_qk_norm and layer.query_norm is not None:
            q = ops.rms_norm(q, layer.query_norm)
        q = _position_encode(q, positions, ts, query_scale, lci.post_qk)
        # Round K/V to the cache dtype first: the dense prefill attends
        # against what the cache stores (attention.cc:247-321).
        k = k.astype(kv_dtype)
        v = v.astype(kv_dtype)
        ks.append(k)
        vs.append(v)

        window = config.attention_window_sizes[layer_idx]
        att = _ring_attention_local(
            q, k, v, positions, positions, prefix_end,
            window=window, att_cap=config.att_cap, axis=axis)
        att = att.reshape(b * tl, heads * qkv_dim).astype(jnp.bfloat16)
        att_sums = matmul(att, layer.att_w, out_dtype=jnp.float32).reshape(
            b, tl, model_dim)
        if lci.post_norm == PostNormType.SCALE and layer.post_att_norm is not None:
            att_sums = ops.rms_norm(att_sums, layer.post_att_norm)
        x = x + att_sums

        # --- FFN: fully local (weights replicated) ---
        y = ops.rms_norm(x, layer.pre_ffw_norm).reshape(
            b * tl, model_dim).astype(jnp.bfloat16)
        act = gated_ffn(y, layer.gating1, layer.gating2,
                        out_dtype=jnp.bfloat16)
        ffw = matmul(act, layer.linear, out_dtype=jnp.float32).reshape(
            b, tl, model_dim)
        if lci.post_norm == PostNormType.SCALE and layer.post_ffw_norm is not None:
            ffw = ops.rms_norm(ffw, layer.post_ffw_norm)
        x = x + ffw

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


def scatter_into_cache(cache: KVCache, kstack, vstack, positions,
                       valid=None) -> KVCache:
    """Write SP-prefill K/V stacks into a standard KVCache (ring rows,
    windowed pools, i8 quantization — whatever the cache kind does).

    kstack/vstack: [L, B, T, KH, qkv_dim] from build_sp_prefill (any
    sharding; XLA inserts the reshard).  Jit-friendly; layer loop is
    static like the forward's."""
    for layer_idx in range(kstack.shape[0]):
        cache = cache.update(layer_idx, positions,
                             kstack[layer_idx].astype(jnp.float32),
                             vstack[layer_idx].astype(jnp.float32),
                             valid=valid)
    return cache
