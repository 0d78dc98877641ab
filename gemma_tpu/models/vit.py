"""SigLIP ViT encoder for PaliGemma / Gemma3 vision (maps gemma/vit.cc).

Structure mirrored from PrefillVit (vit.cc:322-356):
  EmbedImagePatches (patch matmul + learned pos-emb)
  -> N x VitTransformerLayer (LayerNorm, MHA over all patches — no KV
     cache, no causality, biases everywhere — then LayerNorm + MLP)
  -> final LayerNorm
  -> [Gemma3/VLM only] AvgPool4x4 + mm_embed_norm RMS norm
  -> head matmul into the LLM's model_dim => ImageTokens.

All matmuls ride the dequant-fused Pallas GEMM; the whole encoder is one
jittable function over [seq, 588] patches (a single big-M prefill, ideal
MXU shape).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gemma_tpu.models.configs import ModelConfig, PromptWrapping
from gemma_tpu.ops import ops
from gemma_tpu.ops.matmul import QuantTensor, matmul


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
class VitLayerParams:
    """Per-layer ViT weights (LayerWeightsPtrs::vit, gemma/weights.h)."""

    qkv_w: QuantTensor        # [heads * 3 * qkv, vit_dim]
    qkv_b: jnp.ndarray        # [heads * 3 * qkv]
    attn_out_w: QuantTensor   # [vit_dim, heads * qkv]
    attn_out_b: jnp.ndarray   # [vit_dim]
    linear_0_w: QuantTensor   # [ff, vit_dim]
    linear_0_b: jnp.ndarray   # [ff]
    linear_1_w: QuantTensor   # [vit_dim, ff]
    linear_1_b: jnp.ndarray   # [vit_dim]
    ln_0_scale: jnp.ndarray   # [vit_dim]
    ln_0_bias: jnp.ndarray
    ln_1_scale: jnp.ndarray
    ln_1_bias: jnp.ndarray


@_register
@dataclasses.dataclass
class VitParams:
    """ViT globals (WeightsPtrs vit_* members, gemma/weights.h:273-421)."""

    img_emb_kernel: QuantTensor   # [vit_dim, patch*patch*3]
    img_emb_bias: jnp.ndarray     # [vit_dim]
    img_pos_emb: jnp.ndarray      # [seq, vit_dim]
    enc_norm_scale: jnp.ndarray   # [vit_dim]
    enc_norm_bias: jnp.ndarray
    img_head_kernel: QuantTensor  # [model_dim, vit_dim]
    img_head_bias: jnp.ndarray    # [model_dim]
    layers: list[VitLayerParams]
    mm_embed_norm: Any = None     # [vit_dim], Gemma3/VLM only


def vit_attention(x_norm: jnp.ndarray, layer: VitLayerParams,
                  heads: int, qkv_dim: int) -> jnp.ndarray:
    """MHA over all patches (VitAttention, vit.cc:60-206).

    x_norm: [T, vit_dim]; returns att_sums [T, vit_dim].
    """
    t = x_norm.shape[0]
    qkv = matmul(x_norm.astype(jnp.bfloat16), layer.qkv_w,
                 out_dtype=jnp.float32, add=layer.qkv_b)
    qkv = qkv.reshape(t, heads, 3, qkv_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [T, H, D]
    q = q * jnp.float32(1.0 / np.sqrt(qkv_dim))
    scores = jnp.einsum("thd,shd->hts", q, k)
    probs = ops.softmax(scores, axis=-1)
    att = jnp.einsum("hts,shd->thd", probs, v)  # [T, H, D]
    att = att.reshape(t, heads * qkv_dim).astype(jnp.bfloat16)
    return matmul(att, layer.attn_out_w, out_dtype=jnp.float32,
                  add=layer.attn_out_b)


def vit_transformer_layer(x: jnp.ndarray, layer: VitLayerParams,
                          heads: int, qkv_dim: int) -> jnp.ndarray:
    """vit.cc:250-286: pre-LN attention + pre-LN GELU MLP, both residual."""
    y = ops.layer_norm(x, layer.ln_0_scale, layer.ln_0_bias)
    x = x + vit_attention(y, layer, heads, qkv_dim)

    y = ops.layer_norm(x, layer.ln_1_scale, layer.ln_1_bias)
    c1 = matmul(y.astype(jnp.bfloat16), layer.linear_0_w,
                out_dtype=jnp.float32, add=layer.linear_0_b)
    c1 = ops.gelu(c1).astype(jnp.bfloat16)
    ffw = matmul(c1, layer.linear_1_w, out_dtype=jnp.float32,
                 add=layer.linear_1_b)
    return x + ffw


def prefill_vit(vit: VitParams, patches: jnp.ndarray,
                config: ModelConfig) -> jnp.ndarray:
    """[seq, patch^2*3] patches -> ImageTokens [seq/pool^2, model_dim]."""
    vc = config.vit_config
    lc = vc.layer_configs[0]
    # A is converted to bf16 like the reference GEMM's MaybeDecompressA
    # (ops/matmul.h:284-302).
    x = matmul(patches.astype(jnp.bfloat16), vit.img_emb_kernel,
               out_dtype=jnp.float32, add=vit.img_emb_bias)
    x = x + vit.img_pos_emb

    for layer in vit.layers:
        x = vit_transformer_layer(x, layer, lc.heads, lc.qkv_dim)

    x = ops.layer_norm(x, vit.enc_norm_scale, vit.enc_norm_bias)

    if config.wrapping == PromptWrapping.GEMMA_VLM:
        x = ops.avg_pool_4x4(x)
        x = ops.rms_norm(x, vit.mm_embed_norm)

    return matmul(x.astype(jnp.bfloat16), vit.img_head_kernel,
                  out_dtype=jnp.float32, add=vit.img_head_bias)


_JIT_CACHE: dict = {}


def generate_image_tokens(params, image, config: ModelConfig,
                          mesh=None) -> jnp.ndarray:
    """GenerateImageTokens analog (gemma/gemma.cc:688-699).

    With `mesh` set (and params sharded via parallel.shard_params), the 27
    SigLIP layers run tensor-parallel (parallel/vit_tp.py) instead of
    replicated per chip.
    """
    patches = jnp.asarray(image.patches(config.vit_config.patch_width))
    assert patches.shape[0] == config.vit_config.seq_len, (
        patches.shape, config.vit_config.seq_len)
    key = (id(config), id(mesh))
    if key not in _JIT_CACHE:
        if mesh is not None:
            from gemma_tpu.parallel.vit_tp import build_vit_prefill

            _JIT_CACHE[key] = build_vit_prefill(params.vit, config, mesh)
        else:
            _JIT_CACHE[key] = jax.jit(lambda v, p: prefill_vit(v, p, config))
    return _JIT_CACHE[key](params.vit, patches)


# ---------------------------------------------------------------------------
# Loading (the ViT part of gemma/weights.cc).
# ---------------------------------------------------------------------------


def load_vit_params(store, kind_override: str | None = None) -> VitParams:
    """Build VitParams from an io.model_store.ModelStore."""
    from gemma_tpu.ops.matmul import quant_tensor_from_packed

    config: ModelConfig = store.config
    vc = config.vit_config

    def qt(name: str) -> QuantTensor | None:
        pt = store.read_tensor(name)
        if pt is None:
            return None
        return quant_tensor_from_packed(pt, kind_override)

    def vec(name: str) -> jnp.ndarray | None:
        pt = store.read_tensor(name)
        if pt is None:
            return None
        return jnp.asarray(pt.to_f32().reshape(-1))

    def mat(name: str) -> jnp.ndarray | None:
        pt = store.read_tensor(name)
        if pt is None:
            return None
        return jnp.asarray(pt.to_f32())

    layers = []
    for i in range(len(vc.layer_configs)):
        s = f"_{i}"
        layers.append(VitLayerParams(
            qkv_w=qt("qkv_ein_w" + s),
            qkv_b=vec("qkv_ein_b" + s),
            attn_out_w=qt("attn_out_w" + s),
            attn_out_b=vec("attn_out_b" + s),
            linear_0_w=qt("linear_0_w" + s),
            linear_0_b=vec("linear_0_b" + s),
            linear_1_w=qt("linear_1_w" + s),
            linear_1_b=vec("linear_1_b" + s),
            ln_0_scale=vec("ln_0_scale" + s),
            ln_0_bias=vec("ln_0_bias" + s),
            ln_1_scale=vec("ln_1_scale" + s),
            ln_1_bias=vec("ln_1_bias" + s),
        ))
    return VitParams(
        img_emb_kernel=qt("img_emb_kernel"),
        img_emb_bias=vec("img_emb_bias"),
        img_pos_emb=mat("img_pos_emb"),
        enc_norm_scale=vec("enc_norm_scale"),
        enc_norm_bias=vec("enc_norm_bias"),
        img_head_kernel=qt("img_head_kernel"),
        img_head_bias=vec("img_head_bias"),
        layers=layers,
        mm_embed_norm=vec("mm_embed_norm"),
    )
