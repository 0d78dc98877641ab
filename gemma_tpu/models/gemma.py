"""The Gemma transformer forward pass (maps gemma/gemma.cc TransformerLayer
+ attention.cc; see SURVEY.md section 3.2 call stack).

Functional and jit-friendly: `forward(params, tokens, positions, cache, ...)`
processes a [batch, tokens] step (prefill: many tokens, decode: one) and
returns (logits-or-activations, updated cache).  All matmuls go through the
dequant-fused Pallas kernels (ops/matmul.py); everything else is XLA-fused
elementwise work.

Numerics follow the reference exactly (load-bearing for cross-entropy
parity):
  embed: decompress(embedding[token]) * bf16(sqrt(model_dim)) * tensor_scale
         (gemma.cc:119-183)
  layer: x += att(RMSNorm(x)) with optional post-norm; x += ffn(RMSNorm(x))
         (gemma.cc:83-116)
  final: logits = RMSNorm(x) -> bf16 @ embedding^T, softcap
         (gemma.cc:401-457)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gemma_tpu.models.configs import (
    LayerAttentionType,
    ModelConfig,
    PostNormType,
    PostQKType,
)
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.ops import ops
from gemma_tpu.ops.attention import attention_mask, dot_softmax_weighted_sum
from gemma_tpu.ops.matmul import (QuantTensor, gated_ffn, matmul,
                                  matmul_top1, matmul_topk)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return [getattr(obj, n) for n in fields], None

    def unflatten(aux, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_register
@dataclasses.dataclass
class LayerParams:
    """Maps LayerWeightsPtrs (gemma/weights.h:93-269), post-Fixup."""

    qkv1: QuantTensor | None  # [heads * qkv_dim, model_dim]
    qkv2: QuantTensor | None  # [2 * kv_heads * qkv_dim, model_dim]
    att_w: QuantTensor  # [model_dim, heads * qkv_dim]
    gating1: QuantTensor  # [ff_hidden, model_dim]
    gating2: QuantTensor  # [ff_hidden, model_dim]
    linear: QuantTensor  # [model_dim, ff_hidden]
    pre_att_norm: jnp.ndarray  # [model_dim]
    pre_ffw_norm: jnp.ndarray  # [model_dim]
    post_att_norm: jnp.ndarray | None
    post_ffw_norm: jnp.ndarray | None
    key_norm: jnp.ndarray | None  # [qkv_dim]
    query_norm: jnp.ndarray | None  # [qkv_dim]
    # Row-concatenation of qkv1+qkv2 (ops/matmul.py:concat_rows): one
    # GEMM computes q and kv together.  When set, qkv1/qkv2 are None
    # (memory: the weights exist once); parallel/tp.py:shard_params
    # splits it back for head-sharded TP.
    qkv_cat: QuantTensor | None = None


@_register
@dataclasses.dataclass
class Params:
    """Maps WeightsPtrs (gemma/weights.h:273-421); ViT lives in models/vit.py."""

    embedding: QuantTensor  # [vocab, model_dim]
    final_norm: jnp.ndarray  # [model_dim]
    layers: list[LayerParams]
    vit: Any = None


def embed_tokens(
    embedding: QuantTensor, tokens: jnp.ndarray, model_dim: int
) -> jnp.ndarray:
    """EmbedMMToken analog (gemma.cc:135-183): rows * bf16(sqrt(dim)) * scale."""
    emb_scale = ops.embedding_scaling(model_dim) * float(embedding.scale)
    if embedding.kind in ("bf16", "f32"):
        rows = embedding.arrays["w"][tokens].astype(jnp.float32)
    elif embedding.kind in ("sfp", "nuq"):
        from gemma_tpu.compression.sfp import decode_jax

        rows = decode_jax(embedding.arrays["codes"][tokens], jnp.float32)
    elif embedding.kind == "i8":
        codes = embedding.arrays["codes"][tokens].astype(jnp.float32)
        inv = embedding.arrays["inv_scales"][tokens]
        zp = embedding.arrays["zeropoints"][tokens]
        g = inv.shape[-1]
        shaped = codes.reshape(*codes.shape[:-1], g, codes.shape[-1] // g)
        rows = (inv[..., None] * (shaped - zp[..., None])).reshape(codes.shape)
    elif embedding.kind == "i4":
        from gemma_tpu.ops.matmul import _unpack_nuq4

        codes = _unpack_nuq4(embedding.arrays["codes"][tokens]).astype(
            jnp.float32)
        sc = embedding.arrays["scales"][tokens]
        mn = embedding.arrays["mins"][tokens]
        g = sc.shape[-1]
        shaped = codes.reshape(*codes.shape[:-1], g, codes.shape[-1] // g)
        rows = (sc[..., None] * shaped + mn[..., None]).reshape(
            codes.shape)[..., :model_dim]
    elif embedding.kind == "nuq4":
        from gemma_tpu.compression.sfp import decode_jax
        from gemma_tpu.ops.matmul import _unpack_nuq4

        codes = _unpack_nuq4(embedding.arrays["codes"][tokens])[..., :model_dim]
        tables = decode_jax(embedding.arrays["tables"][tokens], jnp.float32)
        g = jnp.arange(model_dim, dtype=jnp.int32) // 256
        rows = jnp.take_along_axis(tables, codes + g * 16, axis=-1)
    else:
        raise ValueError(embedding.kind)
    return rows * jnp.float32(emb_scale)


def transformer_layer(
    layer: LayerParams,
    layer_idx: int,
    x: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    config: ModelConfig,
    prefix_end: jnp.ndarray | int = 0,
    inv_timescale: jnp.ndarray | None = None,
    inv_timescale_global: jnp.ndarray | None = None,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, KVCache]:
    """One TransformerLayer (gemma.cc:83-116). x: [B, T, model_dim] f32."""
    lc = config.layer_configs[layer_idx]
    b, t, model_dim = x.shape
    heads, kv_heads, qkv_dim = lc.heads, lc.kv_heads, lc.qkv_dim

    # Decode (t == 1) folds the layer's elementwise stages into the GEMM
    # kernels: pre-norms as A prologues, post-norms + residual adds as
    # output epilogues (within 1 ulp of the composed ops; the reference
    # runs the whole layer in one pass per ISA for the same
    # kernel-overhead reason, gemma.cc:83-116).  Prefill keeps the
    # composed path: its tuned N-blocked tiles beat a forced full-N grid.
    fuse = t == 1
    x_flat = x.reshape(b * t, model_dim)

    # --- attention (attention.cc GemmaAttention) ---
    if fuse:
        a_in, pro = x_flat, layer.pre_att_norm
    else:
        a_in = ops.rms_norm(x, layer.pre_att_norm).reshape(
            b * t, model_dim).astype(jnp.bfloat16)
        pro = None
    is_global = config.is_global_layer(layer_idx)
    ts = inv_timescale_global if (is_global and inv_timescale_global is not None) \
        else inv_timescale
    query_scale = config.query_scale_value()
    window = config.attention_window_sizes[layer_idx]
    # T == 1 with an integer prefix is the decode hot path; a valid mask
    # routes masked slots' KV writes to the garbage row (a padding slot in
    # a shared decode step must NOT write a real ring row — it could alias
    # a still-attendable position of a prompt being admitted, serving.py).
    is_decode = (t == 1 and isinstance(prefix_end, int) and prefix_end == 0)

    def rope_spec():
        from gemma_tpu.ops.decode_attention import RopeSpec

        return RopeSpec(
            ts, int(lc.post_qk), query_scale,
            key_norm=layer.key_norm if lc.use_qk_norm else None,
            query_norm=layer.query_norm if lc.use_qk_norm else None)

    att_flat = None  # [bt, heads*D] bf16 once attention ran
    if layer.qkv_cat is not None:
        # One GEMM for q and kv (row-concatenated weights).
        qkv_all = matmul(a_in, layer.qkv_cat, out_dtype=jnp.float32,
                         prologue_norm=pro)
        if is_decode:
            # Decode hot path: the GEMM row feeds the fused write+attend
            # kernel LANE-MAJOR (no q/kv slice+stack relayouts) and the
            # kernel emits the att_w GEMM's [bt, heads*D] bf16 A-row
            # directly — QK norms, RoPE, the i8 row quantization, the
            # in-place KV ring write and whole-panel attention all in ONE
            # kernel (ops/decode_attention.py, gemma.cc:83-116).
            from gemma_tpu.ops.decode_attention import (
                decode_attention_write_packed)

            att_flat, cache = decode_attention_write_packed(
                cache, layer_idx, qkv_all, positions, window, heads=heads,
                att_cap=config.att_cap, valid=valid, rope=rope_spec())
        else:
            q = qkv_all[:, : heads * qkv_dim]
            kv = qkv_all[:, heads * qkv_dim:]
    else:
        q = matmul(a_in, layer.qkv1, out_dtype=jnp.float32,
                   prologue_norm=pro)
        kv = matmul(a_in, layer.qkv2, out_dtype=jnp.float32,
                    prologue_norm=pro)

    if att_flat is None:
        q = q.reshape(b, t, heads, qkv_dim)
        kv = kv.reshape(b, t, kv_heads, 2, qkv_dim)
        k, v = kv[..., 0, :], kv[..., 1, :]
        if is_decode:
            # Split-weight decode (TP shards): fused write+attend with
            # host-side head reshapes — ops/decode_attention.py.
            from gemma_tpu.ops.decode_attention import (
                decode_attention_write)

            att_out, cache = decode_attention_write(
                cache, layer_idx, q, positions, k, v, window,
                att_cap=config.att_cap, valid=valid, rope=rope_spec())
        else:
            # Prefill: norms + RoPE (attention.cc:142-151, 288-320),
            # scatter KV rows, then flash attention (Pallas on TPU, XLA
            # fallback elsewhere) — ops/flash_attention.py.
            from gemma_tpu.ops.flash_attention import flash_prefill_attention

            if lc.use_qk_norm and layer.key_norm is not None:
                k = ops.rms_norm(k, layer.key_norm)
            k = _position_encode(k, positions, ts, 1.0, lc.post_qk)
            if lc.use_qk_norm and layer.query_norm is not None:
                q = ops.rms_norm(q, layer.query_norm)
            q = _position_encode(q, positions, ts, query_scale, lc.post_qk)
            cache = cache.update(layer_idx, positions, k, v, valid=valid)
            att_out = flash_prefill_attention(
                cache, layer_idx, q, positions, window,
                att_cap=config.att_cap, prefix_end=prefix_end)
        att_flat = att_out.reshape(
            b * t, heads * qkv_dim).astype(jnp.bfloat16)
    att_out = att_flat
    post_att = layer.post_att_norm \
        if lc.post_norm == PostNormType.SCALE else None
    if fuse:
        # x + postnorm(att @ W) in the GEMM epilogue.
        x_flat = matmul(att_out, layer.att_w, out_dtype=jnp.float32,
                        epilogue_norm=post_att, add=x_flat)
        x = x_flat.reshape(b, t, model_dim)
    else:
        att_sums = matmul(att_out, layer.att_w, out_dtype=jnp.float32)
        att_sums = att_sums.reshape(b, t, model_dim)
        if post_att is not None:
            att_sums = ops.rms_norm(att_sums, post_att)
        x = x + att_sums
        x_flat = x.reshape(b * t, model_dim)

    # --- FFN (gemma-inl.h FFWNoVit) ---
    # Fused TwoMatMul epilogue: gelu(C1)*C2 inside one kernel, no f32
    # [bt, ff] HBM round-trips (ops/matmul.py:gated_ffn).
    post_ffw = layer.post_ffw_norm \
        if lc.post_norm == PostNormType.SCALE else None
    if fuse:
        activated = gated_ffn(x_flat, layer.gating1, layer.gating2,
                              out_dtype=jnp.bfloat16,
                              prologue_norm=layer.pre_ffw_norm)
        out = matmul(activated, layer.linear, out_dtype=jnp.float32,
                     epilogue_norm=post_ffw, add=x_flat)
        return out.reshape(b, t, model_dim), cache
    y_norm = ops.rms_norm(x, layer.pre_ffw_norm).reshape(b * t, model_dim)
    y_bf = y_norm.astype(jnp.bfloat16)
    activated = gated_ffn(y_bf, layer.gating1, layer.gating2,
                          out_dtype=jnp.bfloat16)
    ffw_out = matmul(activated, layer.linear, out_dtype=jnp.float32)
    ffw_out = ffw_out.reshape(b, t, model_dim)
    if post_ffw is not None:
        ffw_out = ops.rms_norm(ffw_out, post_ffw)
    return x + ffw_out, cache


def _position_encode(x, positions, inv_timescale, mul, post_qk):
    """RoPE applied per (b, t) position to [B, T, H, D]."""
    pos = positions[..., None]  # broadcast over heads
    if post_qk == PostQKType.HALF_ROPE:
        return ops.half_rope(x, pos, inv_timescale, mul)
    return ops.rope(x, pos, inv_timescale, mul)


def forward(
    params: Params,
    tokens: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    config: ModelConfig,
    prefix_end: jnp.ndarray | int = 0,
    return_logits: str = "all",
    image_embeddings: jnp.ndarray | None = None,
    image_slot_mask: jnp.ndarray | None = None,
    valid: jnp.ndarray | None = None,
    top1_mask: jnp.ndarray | None = None,
    top_k_n: int = 0,
    top1_need_prob: bool = True,
) -> tuple[jnp.ndarray | None, KVCache]:
    """Run the full stack over a [B, T] token step.

    return_logits: "all" -> [B, T, vocab]; "last" -> [B, vocab] for the final
    token; "top1" -> ((token [B], prob [B]), cache) greedy head fused into
    the logits GEMM (optionally constrained by top1_mask [vocab], the
    allowed-token TokenSet); "topk" -> ((values [B, top_k_n], indices
    [B, top_k_n]), cache) fused top-k head for sampled decode;
    "none" -> (None, cache) (prefill).
    top1_need_prob=False (greedy paths whose callers discard the prob):
    the token is bit-identical, prob returns 1.0, and the head kernel
    skips the softcap tanh + softmax exp over the [B, vocab] row (pure
    VPU work serial with the MXU dots — ops/matmul.py:_top1_kernel).
    image_embeddings/image_slot_mask splice precomputed image token rows into
    the embedding stream (gemma.cc:144-157, PaliGemma/VLM prefill).
    """
    b, t = tokens.shape
    model_dim = config.model_dim
    lc = config.layer_configs[0]

    x = embed_tokens(params.embedding, tokens, model_dim)
    if config.absolute_pe:
        # Applied BEFORE the image splice: EmbedMMToken returns before
        # AddAbsolutePositionalEmbeddings for image rows (gemma.cc:144-157),
        # so image tokens never get absolute PE.
        x = x + _absolute_pe(positions, model_dim)
    if image_embeddings is not None and image_slot_mask is not None:
        x = jnp.where(image_slot_mask[..., None], image_embeddings, x)

    half_rope = lc.post_qk == PostQKType.HALF_ROPE
    inv_ts = jnp.asarray(ops.create_inv_timescale(lc.qkv_dim, half_rope))
    inv_ts_g = None
    from gemma_tpu.models.configs import is_vlm

    # Global layers of VLM-family models use a 1e6 RoPE base; keyed on the
    # MODEL, not the prompt wrapping (attention.cc:85-88).
    if is_vlm(config.model):
        inv_ts_g = jnp.asarray(
            ops.create_inv_timescale(lc.qkv_dim, half_rope, base_frequency=1e6)
        )

    for layer_idx, layer in enumerate(params.layers):
        x, cache = transformer_layer(
            layer, layer_idx, x, positions, cache, config, prefix_end,
            inv_ts, inv_ts_g, valid,
        )

    if return_logits == "none":
        return None, cache
    if return_logits == "top1":
        # Greedy head: argmax + its softmax prob fused into the logits
        # GEMM (final norm as prologue, softcap + online top1 in-kernel;
        # the [B, vocab] logits never reach HBM).  Top1OfSoftmax,
        # ops-inl.h:1228-1257.
        tok, prob = matmul_top1(
            x[:, -1, :], params.embedding, final_cap=config.final_cap,
            prologue_norm=params.final_norm, allowed_mask=top1_mask,
            need_prob=top1_need_prob)
        return (tok, prob), cache
    if return_logits == "topk":
        vals, idxs = matmul_topk(
            x[:, -1, :], params.embedding, top_k_n,
            final_cap=config.final_cap, prologue_norm=params.final_norm,
            allowed_mask=top1_mask)
        return (vals, idxs), cache
    if return_logits == "last":
        # One row per query: fold the final RMSNorm into the logits GEMM
        # prologue (bit-identical; saves the normed-x HBM round trip).
        x1 = x[:, -1, :]
        logits = matmul(x1, params.embedding, out_dtype=jnp.float32,
                        prologue_norm=params.final_norm)
        return ops.soft_cap(config.final_cap, logits), cache
    x_bf = ops.rms_norm(x, params.final_norm).astype(jnp.bfloat16)
    bt = x_bf.shape[0] * x_bf.shape[1]
    logits = matmul(x_bf.reshape(bt, model_dim), params.embedding,
                    out_dtype=jnp.float32)
    logits = ops.soft_cap(config.final_cap, logits)
    logits = logits.reshape(x_bf.shape[0], x_bf.shape[1], -1)
    return logits, cache


def forward_collect(
    params: Params,
    tokens: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    config: ModelConfig,
) -> tuple[jnp.ndarray, KVCache, dict]:
    """Forward pass that also returns per-layer activations (the observer
    hooks LayersOutputFunc/ActivationsObserverFunc, gemma/gemma.cc:64-66 +
    evals/debug_prompt.cc).  Keys follow the reference's dump: "tokens",
    "blocks.<i>" (post-layer residual), "final_norm", "logits"."""
    collected: dict = {"tokens": tokens}
    b, t = tokens.shape
    lc = config.layer_configs[0]
    x = embed_tokens(params.embedding, tokens, config.model_dim)
    if config.absolute_pe:
        x = x + _absolute_pe(positions, config.model_dim)
    collected["embedding"] = x
    half_rope = lc.post_qk == PostQKType.HALF_ROPE
    inv_ts = jnp.asarray(ops.create_inv_timescale(lc.qkv_dim, half_rope))
    for layer_idx, layer in enumerate(params.layers):
        x, cache = transformer_layer(
            layer, layer_idx, x, positions, cache, config, 0, inv_ts, None,
        )
        collected[f"blocks.{layer_idx}"] = x
    x_bf = ops.rms_norm(x, params.final_norm).astype(jnp.bfloat16)
    collected["final_norm"] = x_bf.astype(jnp.float32)
    logits = matmul(x_bf.reshape(b * t, config.model_dim), params.embedding,
                    out_dtype=jnp.float32)
    logits = ops.soft_cap(config.final_cap, logits).reshape(b, t, -1)
    collected["logits"] = logits
    return logits, cache, collected


def _absolute_pe(positions: jnp.ndarray, model_dim: int) -> jnp.ndarray:
    """AddAbsolutePositionalEmbeddings (ops-inl.h:316-330)."""
    half = model_dim // 2
    log_inc = np.log(10000.0) / max(half - 1, 1)
    inv = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -log_inc)
    theta = positions[..., None].astype(jnp.float32) * inv
    return jnp.concatenate([jnp.sin(theta), jnp.cos(theta)], axis=-1)


# ---------------------------------------------------------------------------
# Weights loading (maps gemma/weights.cc ReadFromBlobs + Fixup).
# ---------------------------------------------------------------------------


def _slice_rows(qt: QuantTensor, lo: int, hi: int) -> QuantTensor:
    """Split stacked tensors by rows at the device-layout level (the
    SplitW1/SplitAttW1 analog, weights.cc:90-170): every layout stores
    per-element or per-(row, group) arrays, so row slicing is exact."""
    arrays = {k: v[lo:hi] for k, v in qt.arrays.items()}
    return QuantTensor(qt.kind, (hi - lo, qt.k), qt.scale, arrays)


def _fixup_att_weights(qt: QuantTensor, heads: int, model_dim: int,
                       qkv_dim: int) -> QuantTensor:
    """att_ein [heads*model_dim, qkv] -> att_w [model_dim, heads*qkv]
    (InitAttWeights, weights.cc:46-87).  Pure permutation of the
    per-element arrays; i8 group scales permute along (128-sized) blocks."""
    def permute(a):
        return (
            a.reshape(heads, model_dim, *a.shape[1:])
            .swapaxes(0, 1)
            .reshape(model_dim, -1, *a.shape[2:])
        )

    arrays = {k: permute(v) for k, v in qt.arrays.items()}
    return QuantTensor(qt.kind, (model_dim, heads * qkv_dim), qt.scale, arrays)


def load_params(store, kind_override: str | None = None,
                fuse_qkv: bool = True) -> Params:
    """Build device Params from an io.model_store.ModelStore.

    fuse_qkv: row-concatenate each layer's q and kv projections into one
    QuantTensor (one GEMM per layer instead of two; qkv1/qkv2 become
    None).  Disable to keep the split layout (e.g. for tools that
    inspect per-tensor weights)."""
    config: ModelConfig = store.config
    from gemma_tpu.ops.matmul import quant_tensor_from_packed

    def qt(name: str, kind=None) -> QuantTensor | None:
        pt = store.read_tensor(name)
        if pt is None:
            return None
        return quant_tensor_from_packed(pt, kind or kind_override)

    def norm(name: str) -> jnp.ndarray | None:
        pt = store.read_tensor(name)
        if pt is None:
            return None
        return jnp.asarray(pt.to_f32().reshape(-1))

    embedding = qt("c_embedding")
    final_norm = norm("c_final_norm")
    layers = []
    for i, lc in enumerate(config.layer_configs):
        if lc.type != LayerAttentionType.GEMMA:
            continue
        s = f"_{i}"
        heads, kv_heads, qkv_dim = lc.heads, lc.kv_heads, lc.qkv_dim

        q1 = qt("qkv1_w" + s)
        q2 = qt("qkv2_w" + s)
        if q1 is None:
            stacked = qt("qkv_ein" + s)
            w1_rows = heads * qkv_dim
            q1 = _slice_rows(stacked, 0, w1_rows)
            q2 = _slice_rows(stacked, w1_rows, w1_rows + 2 * kv_heads * qkv_dim)

        g1 = qt("gating1_w" + s)
        g2 = qt("gating2_w" + s)
        if g1 is None:
            stacked = qt("gating_ein" + s)
            g1 = _slice_rows(stacked, 0, lc.ff_hidden_dim)
            g2 = _slice_rows(stacked, lc.ff_hidden_dim, 2 * lc.ff_hidden_dim)

        att_w = qt("att_w" + s)
        if att_w is None:
            if kind_override == "i4":
                # i4 is a load-time transcode anyway, so Fixup the f32
                # values on the host and encode the PERMUTED matrix —
                # groups land on the final layout for every qkv_dim
                # (InitAttWeights, weights.cc:46-87).
                from gemma_tpu.ops.matmul import quant_tensor_i4

                pt = store.read_tensor("att_ein" + s)
                vals = (pt.to_f32().reshape(heads, config.model_dim, qkv_dim)
                        .swapaxes(0, 1).reshape(config.model_dim, -1))
                att_w = quant_tensor_i4(np.ascontiguousarray(vals))
            else:
                # nuq4's per-256 groups do not survive the permutation when
                # qkv_dim < 256; the byte layout is always exact.
                ein_kind = "nuq" if kind_override == "nuq4" else kind_override
                att_ein = qt("att_ein" + s, kind=ein_kind)
                att_w = _fixup_att_weights(att_ein, heads, config.model_dim,
                                           qkv_dim)

        from gemma_tpu.ops.matmul import concat_rows

        cat = concat_rows(q1, q2) if fuse_qkv else None
        if cat is not None:
            q1 = q2 = None
        layers.append(
            LayerParams(
                qkv1=q1,
                qkv2=q2,
                qkv_cat=cat,
                att_w=att_w,
                gating1=g1,
                gating2=g2,
                linear=qt("linear_w" + s),
                pre_att_norm=norm("pre_att_ns" + s),
                pre_ffw_norm=norm("pre_ff_ns" + s),
                post_att_norm=norm("post_att_ns" + s),
                post_ffw_norm=norm("post_ff_ns" + s),
                key_norm=norm("key_norm" + s),
                query_norm=norm("query_norm" + s),
            )
        )
    return Params(embedding=embedding, final_norm=final_norm, layers=layers)
