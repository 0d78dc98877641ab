"""Scan-over-layers decode: one `lax.scan` instead of L unrolled layers.

The dense decode step used to unroll every transformer layer into the
executable (~7 kernels x 26 layers at 2B).  This module stacks the
per-layer weights into [T, ...]-leading leaves ONCE at load and runs the
step as one `lax.scan` whose body indexes the stacked weights INSIDE the
Pallas kernels via a scalar-prefetch layer index
(ops/matmul.py:_b_inputs_stacked, ops/decode_attention.py) — the kernel
DMAs exactly one layer's blocks out of the stacked HBM arrays, so no
per-layer weight copy ever materializes (scanning the weights as `xs`
would dynamic-slice a full copy per step).  The executable carries ONE
layer body; compile time and program size drop ~L-fold.

Layer heterogeneity (sliding-window vs global attention, local vs global
RoPE bases, windowed KV pools) is handled by grouping layers into the
config's repeating PATTERN PERIOD P (Gemma2 alternates local/global,
P=2; Gemma3 runs 5 local + 1 global, P=6): the scan body unrolls one
period — each position p has a STATIC window, ring, pool identity and
timescale — and scans T = L/P iterations; position p's row in its KV
pool at iteration t is the affine stride_p * t + off_p (traced), which
the attention kernels consume as a scalar-prefetch index.

Numerics are bit-identical to models/gemma.py:forward's fused decode
path (same kernels, same fused prologue/epilogue stages, same order) —
tests/test_scan_decode.py compares them bit-strictly.

Reference analog: the single TransformerLayer loop the reference runs
per layer (gemma/gemma.cc:83-116); the stacking itself has no reference
counterpart (an XLA-specific executable-size/dispatch optimization).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gemma_tpu.models.configs import (LayerAttentionType, ModelConfig,
                                      PostNormType, PostQKType, is_vlm)
from gemma_tpu.models.gemma import (LayerParams, Params, _absolute_pe,
                                    embed_tokens)
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.ops import ops
from gemma_tpu.ops.decode_attention import RopeSpec, decode_attention_write
from gemma_tpu.ops.matmul import (QuantTensor, gated_ffn, matmul,
                                  matmul_top1, matmul_topk,
                                  stack_quant_tensors)


def detect_period(config: ModelConfig) -> int | None:
    """Smallest P dividing L with layer signatures repeating mod P, or
    None when layers are not scannable (non-GEMMA layer types)."""
    lcs = config.layer_configs
    n = len(lcs)

    def sig(i):
        lc = lcs[i]
        if lc.type != LayerAttentionType.GEMMA:
            return None
        return (config.attention_window_sizes[i],
                config.is_global_layer(i), lc.heads, lc.kv_heads,
                lc.qkv_dim, lc.ff_hidden_dim, lc.post_norm, lc.post_qk,
                lc.use_qk_norm)

    sigs = [sig(i) for i in range(n)]
    if any(s is None for s in sigs):
        return None
    for p in range(1, n + 1):
        if n % p == 0 and all(sigs[i] == sigs[i % p] for i in range(n)):
            return p
    return n


def build_scan_params(params: Params, config: ModelConfig) -> Params | None:
    """Stack params.layers into P period-position LayerParams whose leaves
    carry a leading [T] dim (QuantTensors via stack_quant_tensors — the
    kernel-prelaid layout; norm vectors via jnp.stack).

    Returns None when the model is not scannable: heterogeneous layer
    aux (per-tensor codec scales that differ per layer — load with
    --kind i8 / --kind i4), non-periodic layer patterns, or T == 1
    (nothing to scan).
    """
    period = detect_period(config)
    if period is None:
        return None
    n = len(params.layers)
    t_iters = n // period
    if t_iters <= 1:
        return None

    def stack_leaf(leaves):
        if all(x is None for x in leaves):
            return None
        if any(x is None for x in leaves):
            raise ValueError("mixed None/array leaf across layers")
        if isinstance(leaves[0], QuantTensor):
            return stack_quant_tensors(list(leaves))
        return jnp.stack(leaves)

    stacks = []
    try:
        for p in range(period):
            group = [params.layers[t * period + p] for t in range(t_iters)]
            fields = {}
            for f in dataclasses.fields(LayerParams):
                fields[f.name] = stack_leaf([getattr(l, f.name)
                                             for l in group])
            stacks.append(LayerParams(**fields))
    except ValueError:
        return None
    return Params(embedding=params.embedding, final_norm=params.final_norm,
                  layers=stacks, vit=params.vit)


def _pool_affine(cache: KVCache, period: int, t_iters: int):
    """Per period position: (is_local, off, stride) such that layer
    t*P + p sits at row-index off + stride*t of its (static) pool."""
    out = []
    for p in range(period):
        if not cache.layer_map:
            out.append((False, p, period))
            continue
        entries = [cache.layer_map[t * period + p] for t in range(t_iters)]
        is_local = entries[0][0]
        assert all(e[0] == is_local for e in entries), \
            "period position maps to both pools (layer_map not periodic)"
        idxs = [e[1] for e in entries]
        stride = idxs[1] - idxs[0] if t_iters > 1 else 0
        assert all(idxs[t] == idxs[0] + stride * t
                   for t in range(t_iters)), \
            f"pool indices not affine in t at position {p}: {idxs}"
        out.append((is_local, idxs[0], stride))
    return out


def _dyn(a, t):
    """Dynamic-index a [T, ...] stacked small array (norm vectors)."""
    if a is None:
        return None
    return jax.lax.dynamic_index_in_dim(a, t, 0, keepdims=False)


def forward_scan(
    sparams: Params,
    tokens: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    config: ModelConfig,
    return_logits: str = "last",
    valid: jnp.ndarray | None = None,
    top1_mask: jnp.ndarray | None = None,
    top_k_n: int = 0,
    top1_need_prob: bool = True,
) -> tuple:
    """The T == 1 decode step of models/gemma.py:forward, with the layer
    loop as ONE lax.scan over the stacked sparams (build_scan_params).

    Bit-identical to forward's fused decode path: the body runs the same
    fused kernels (pre-norm GEMM prologues, write+attend+RoPE attention,
    epilogue-norm + residual adds, fused gated FFN) with the layer
    selected by scalar prefetch instead of Python unrolling.
    """
    b, t = tokens.shape
    assert t == 1, "forward_scan is the decode (T == 1) step"
    period = len(sparams.layers)
    lead = next(a for a in jax.tree_util.tree_leaves(sparams.layers[0])
                if hasattr(a, "shape"))
    t_iters = lead.shape[0]
    model_dim = config.model_dim
    lc0 = config.layer_configs[0]

    x = embed_tokens(sparams.embedding, tokens, model_dim)
    if config.absolute_pe:
        x = x + _absolute_pe(positions, model_dim)
    x_flat = x.reshape(b, model_dim)

    half_rope = lc0.post_qk == PostQKType.HALF_ROPE
    inv_ts = jnp.asarray(ops.create_inv_timescale(lc0.qkv_dim, half_rope))
    inv_ts_g = inv_ts
    if is_vlm(config.model):
        inv_ts_g = jnp.asarray(ops.create_inv_timescale(
            lc0.qkv_dim, half_rope, base_frequency=1e6))
    query_scale = config.query_scale_value()

    affine = _pool_affine(cache, period, t_iters)
    quant = cache.quantized

    def body(carry, ti):
        x_flat, kv, kv_scale, kv_local, kv_local_scale = carry
        for p in range(period):
            layer = sparams.layers[p]
            layer_idx0 = p  # layer t*P+p; config lookups are periodic
            lci = config.layer_configs[layer_idx0]
            heads, kv_heads, qkv_dim = lci.heads, lci.kv_heads, lci.qkv_dim
            window = config.attention_window_sizes[layer_idx0]
            is_global = config.is_global_layer(layer_idx0)
            ts = inv_ts_g if is_global else inv_ts
            is_local, off, stride = affine[p]
            pool = kv_local if is_local else kv
            sc = kv_local_scale if is_local else kv_scale
            ring = cache.seq_len_local if is_local else cache.seq_len
            idx = off + stride * ti

            pre_att = _dyn(layer.pre_att_norm, ti)
            if layer.qkv_cat is not None:
                qkv_all = matmul(x_flat, layer.qkv_cat,
                                 out_dtype=jnp.float32,
                                 prologue_norm=pre_att, layer=ti)
                q = qkv_all[:, : heads * qkv_dim]
                kvp = qkv_all[:, heads * qkv_dim:]
            else:
                q = matmul(x_flat, layer.qkv1, out_dtype=jnp.float32,
                           prologue_norm=pre_att, layer=ti)
                kvp = matmul(x_flat, layer.qkv2, out_dtype=jnp.float32,
                             prologue_norm=pre_att, layer=ti)
            q = q.reshape(b, 1, heads, qkv_dim)
            kvp = kvp.reshape(b, 1, kv_heads, 2, qkv_dim)
            k, v = kvp[..., 0, :], kvp[..., 1, :]

            spec = RopeSpec(
                ts, int(lci.post_qk), query_scale,
                key_norm=_dyn(layer.key_norm, ti)
                if lci.use_qk_norm else None,
                query_norm=_dyn(layer.query_norm, ti)
                if lci.use_qk_norm else None)
            # A single-pool view: layer_map=() makes KVCache.pool() pass
            # the traced idx straight through to the kernels.
            tmp = KVCache(kv=pool, seq_len=ring, kv_scale=sc)
            att_out, tmp = decode_attention_write(
                tmp, idx, q, positions, k, v, window,
                att_cap=config.att_cap, valid=valid, rope=spec)
            pool, sc = tmp.kv, tmp.kv_scale
            if is_local:
                kv_local, kv_local_scale = pool, sc
            else:
                kv, kv_scale = pool, sc

            att2 = att_out.reshape(b, heads * qkv_dim).astype(jnp.bfloat16)
            post_att = _dyn(layer.post_att_norm, ti) \
                if lci.post_norm == PostNormType.SCALE else None
            x_flat = matmul(att2, layer.att_w, out_dtype=jnp.float32,
                            epilogue_norm=post_att, add=x_flat, layer=ti)

            post_ffw = _dyn(layer.post_ffw_norm, ti) \
                if lci.post_norm == PostNormType.SCALE else None
            activated = gated_ffn(x_flat, layer.gating1, layer.gating2,
                                  out_dtype=jnp.bfloat16,
                                  prologue_norm=_dyn(layer.pre_ffw_norm, ti),
                                  layer=ti)
            x_flat = matmul(activated, layer.linear, out_dtype=jnp.float32,
                            epilogue_norm=post_ffw, add=x_flat, layer=ti)
        return (x_flat, kv, kv_scale, kv_local, kv_local_scale), None

    carry = (x_flat, cache.kv, cache.kv_scale, cache.kv_local,
             cache.kv_local_scale)
    (x_flat, kv, kv_scale, kv_local, kv_local_scale), _ = jax.lax.scan(
        body, carry, jnp.arange(t_iters, dtype=jnp.int32))
    cache = dataclasses.replace(cache, kv=kv, kv_scale=kv_scale,
                                kv_local=kv_local,
                                kv_local_scale=kv_local_scale)

    if return_logits == "none":
        return None, cache
    if return_logits == "top1":
        tok, prob = matmul_top1(
            x_flat, sparams.embedding, final_cap=config.final_cap,
            prologue_norm=sparams.final_norm, allowed_mask=top1_mask,
            need_prob=top1_need_prob)
        return (tok, prob), cache
    if return_logits == "topk":
        vals, idxs = matmul_topk(
            x_flat, sparams.embedding, top_k_n,
            final_cap=config.final_cap, prologue_norm=sparams.final_norm,
            allowed_mask=top1_mask)
        return (vals, idxs), cache
    assert return_logits == "last", return_logits
    logits = matmul(x_flat, sparams.embedding, out_dtype=jnp.float32,
                    prologue_norm=sparams.final_norm)
    return ops.soft_cap(config.final_cap, logits), cache
