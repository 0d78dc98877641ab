"""Int8 KV-cache quantization helpers.

The reference stores KV as f32 (gemma/kv_cache.h:30, KV_t = float); round 1
narrowed to bf16.  This module adds a symmetric per-(position, head) int8
mode that halves KV HBM traffic again — and, unlike weight codecs, never
needs per-element dequantization in the attention kernels:

    scores[g, s] = scale_k[s] * (q[g] . codes_k[s])     (scale the output)
    out[g]       = sum_s (p[g, s] * scale_v[s]) codes_v[s]  (fold into p)

so the [S, D] panels feed the MXU as raw codes, exactly like the i8 weight
GEMM (ops/matmul.py).  Quantization: scale = max|row| / 127, codes =
round-to-nearest-even (jnp.rint) — one scale per (batch, layer, k/v, head,
position), i.e. 256 values share a scale at qkv_dim 256.
"""

from __future__ import annotations

import jax.numpy as jnp

# int8 code range is [-127, 127] (symmetric; -128 unused).
KV_QMAX = 127.0


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize along the last axis.

    x: [..., D] f32/bf16 -> (codes i8 [..., D], scale f32 [...]).
    All-zero rows get scale 0 (codes 0, dequant exact).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / KV_QMAX
    inv = jnp.where(scale > 0.0, 1.0 / scale, 0.0)
    codes = jnp.rint(xf * inv[..., None]).astype(jnp.int8)
    return codes, scale


def dequantize_rows(codes: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """codes i8 [..., D], scale f32 [...] -> f32 [..., D]."""
    return codes.astype(jnp.float32) * scale[..., None].astype(jnp.float32)
