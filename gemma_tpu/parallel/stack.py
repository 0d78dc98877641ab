"""Shared composed layer stack for the shard_map forward bodies.

`parallel/sp.py` (sequence-parallel prefill) and `parallel/cp.py`
(context-parallel decode) run the same transformer math — embedding
scale, (1+w) RMSNorms, QKV GEMMs, QK norms + RoPE ordering, post-norms,
gated FFN (the numerics contract of models/gemma.py:transformer_layer,
gemma/gemma.cc + attention.cc) — and differ ONLY in what "attend" means
(ring rotation vs partial-softmax merge vs cache writes).  This module
holds the one copy of the shared scaffolding; each parallel mode passes
an `attend` callback.

models/gemma.py deliberately does NOT route through this: the dense
forward is the oracle every parallel test compares against (and carries
the fused decode prologue/epilogue paths), so it stays an independent
implementation.
"""

from __future__ import annotations

import jax.numpy as jnp

from gemma_tpu.models.configs import (ModelConfig, PostNormType, PostQKType,
                                      is_vlm)
from gemma_tpu.models.gemma import (Params, _absolute_pe, _position_encode,
                                    embed_tokens)
from gemma_tpu.ops import ops
from gemma_tpu.ops.matmul import gated_ffn, matmul


def rope_timescales(config: ModelConfig):
    """(inv_ts, inv_ts_global-or-None, query_scale) for the stack."""
    lc = config.layer_configs[0]
    half_rope = lc.post_qk == PostQKType.HALF_ROPE
    inv_ts = jnp.asarray(ops.create_inv_timescale(lc.qkv_dim, half_rope))
    inv_ts_g = None
    if is_vlm(config.model):  # global-layer RoPE base (attention.cc:85-88)
        inv_ts_g = jnp.asarray(ops.create_inv_timescale(
            lc.qkv_dim, half_rope, base_frequency=1e6))
    return inv_ts, inv_ts_g, config.query_scale_value()


def apply_layer(layer, layer_idx: int, x, positions, *,
                config: ModelConfig, inv_ts, inv_ts_g, query_scale,
                attend) -> jnp.ndarray:
    """One composed transformer layer on x [B, T, D] f32.

    attend(layer_idx, lci, q, k, v) -> [B, T, heads, qkv_dim] f32.
    q is RoPE'd and query-scaled; k, v are key-normed + RoPE'd f32 (the
    values a cache would store, before dtype rounding — the callback
    owns rounding/quantization and any cache side effects via closure).
    """
    b, t, model_dim = x.shape
    lci = config.layer_configs[layer_idx]
    is_global = config.is_global_layer(layer_idx)
    ts = inv_ts_g if (is_global and inv_ts_g is not None) else inv_ts
    heads, kv_heads, qkv_dim = lci.heads, lci.kv_heads, lci.qkv_dim

    a_in = ops.rms_norm(x, layer.pre_att_norm).reshape(
        b * t, model_dim).astype(jnp.bfloat16)
    if layer.qkv_cat is not None:
        qkv_all = matmul(a_in, layer.qkv_cat, out_dtype=jnp.float32)
        q = qkv_all[:, : heads * qkv_dim]
        kv = qkv_all[:, heads * qkv_dim:]
    else:
        q = matmul(a_in, layer.qkv1, out_dtype=jnp.float32)
        kv = matmul(a_in, layer.qkv2, out_dtype=jnp.float32)
    q = q.reshape(b, t, heads, qkv_dim)
    kv = kv.reshape(b, t, kv_heads, 2, qkv_dim)
    k, v = kv[..., 0, :], kv[..., 1, :]

    if lci.use_qk_norm and layer.key_norm is not None:
        k = ops.rms_norm(k, layer.key_norm)
    k = _position_encode(k, positions, ts, 1.0, lci.post_qk)
    if lci.use_qk_norm and layer.query_norm is not None:
        q = ops.rms_norm(q, layer.query_norm)
    q = _position_encode(q, positions, ts, query_scale, lci.post_qk)

    att = attend(layer_idx, lci, q, k, v)
    att = att.reshape(b * t, heads * qkv_dim).astype(jnp.bfloat16)
    att_sums = matmul(att, layer.att_w, out_dtype=jnp.float32).reshape(
        b, t, model_dim)
    if lci.post_norm == PostNormType.SCALE \
            and layer.post_att_norm is not None:
        att_sums = ops.rms_norm(att_sums, layer.post_att_norm)
    x = x + att_sums

    y = ops.rms_norm(x, layer.pre_ffw_norm).reshape(
        b * t, model_dim).astype(jnp.bfloat16)
    act = gated_ffn(y, layer.gating1, layer.gating2,
                    out_dtype=jnp.bfloat16)
    ffw = matmul(act, layer.linear, out_dtype=jnp.float32).reshape(
        b, t, model_dim)
    if lci.post_norm == PostNormType.SCALE \
            and layer.post_ffw_norm is not None:
        ffw = ops.rms_norm(ffw, layer.post_ffw_norm)
    return x + ffw


def stack_forward(params: Params, tokens, positions, *,
                  config: ModelConfig, attend) -> jnp.ndarray:
    """Run every layer on [B, T] local tokens; returns x [B, T, D] f32."""
    x = embed_tokens(params.embedding, tokens, config.model_dim)
    if config.absolute_pe:
        x = x + _absolute_pe(positions, config.model_dim)
    inv_ts, inv_ts_g, query_scale = rope_timescales(config)
    for layer_idx, layer in enumerate(params.layers):
        x = apply_layer(layer, layer_idx, x, positions, config=config,
                        inv_ts=inv_ts, inv_ts_g=inv_ts_g,
                        query_scale=query_scale, attend=attend)
    return x
