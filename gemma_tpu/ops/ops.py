"""Transformer math ops (maps ops/ops-inl.h + ops/ops.h), as pure JAX.

Each op reproduces the reference's exact formula -- these choices are
load-bearing for cross-entropy parity (SURVEY.md section 7 hard parts):

  - RMSNorm uses eps=1e-6 *inside* the sqrt and the (1 + weight) form
    (ops-inl.h:212-232).
  - RoPE rotates pairs (i, i + d/2) ("split halves"), with inv timescales
    computed via pow (NOT exp(ln(base)*x), which changes results;
    ops/ops.h:36-38).  Gemma3 VLM global layers use base 1e6
    (gemma/activations.h:77-79).
  - Gelu is the tanh approximation with the training constants
    (ops-inl.h:127-137).
  - Soft caps are cap * tanh(x / cap) (ops-inl.h:1259-1272).
  - The embedding scale is sqrt(model_dim) rounded to bf16 *before* the
    multiply (gemma/gemma.cc:119-123).

Everything here is elementwise/VPU work that XLA fuses into the surrounding
matmuls; no Pallas needed (the hot kernels live in ops/matmul.py and
ops/flash_attention.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """RMSNorm with (1 + weight) scaling, f32 accumulation (ops-inl.h:212-245).

    x: [..., size], weight: [size]; returns same dtype as x.
    """
    xf = x.astype(jnp.float32)
    mul = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
    m = xf * mul
    out = m + m * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """LayerNorm for the ViT (ops-inl.h:286-313): (x-mu)*scale*rsqrt(var+1e-6)+bias."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    mul = scale.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-6)
    return ((xf - mu) * mul + bias.astype(jnp.float32)).astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-approximation Gelu with the reference's constants (ops-inl.h:127-137)."""
    xf = x.astype(jnp.float32)
    arg = xf * (0.797884560804236 + 0.03567740813636141 * xf * xf)
    return (xf * (0.5 + 0.5 * jnp.tanh(arg))).astype(x.dtype)


def soft_cap(cap: float, x: jnp.ndarray) -> jnp.ndarray:
    """cap * tanh(x / cap); no-op when cap == 0 (ops-inl.h:1259-1308)."""
    if cap == 0.0:
        return x
    xf = x.astype(jnp.float32)
    return (cap * jnp.tanh(xf / cap)).astype(x.dtype)


def create_inv_timescale(
    qkv_dim: int, half_rope: bool = False, base_frequency: float = 10000.0
) -> np.ndarray:
    """RoPE inverse timescales, f64 pow then f32 (ops/ops.h:28-42)."""
    rope_dim = qkv_dim // 2 if half_rope else qkv_dim
    dims = np.arange(rope_dim // 2, dtype=np.float64)
    return (1.0 / np.power(base_frequency, 2.0 * dims / rope_dim)).astype(np.float32)


def rope(
    x: jnp.ndarray,
    pos: jnp.ndarray,
    inv_timescale: jnp.ndarray,
    mul: float | jnp.ndarray = 1.0,
) -> jnp.ndarray:
    """Split-halves RoPE (ops-inl.h:358-475 Rope/RopeAndMulBy).

    x:   [..., dim_qkv] with dim_qkv == 2 * len(inv_timescale)
    pos: broadcastable to x.shape[:-1] (token positions)
    mul: optional constant folded into the rotation (query scaling).
    """
    half = x.shape[-1] // 2
    xf = x.astype(jnp.float32) * jnp.float32(mul)
    theta = (
        jnp.asarray(pos, jnp.float32)[..., None]
        * inv_timescale.astype(jnp.float32)
    )
    sin, cos = jnp.sin(theta), jnp.cos(theta)
    x0, x1 = xf[..., :half], xf[..., half:]
    out0 = x0 * cos - x1 * sin
    out1 = x0 * sin + x1 * cos
    return jnp.concatenate([out0, out1], axis=-1).astype(x.dtype)


def half_rope(
    x: jnp.ndarray,
    pos: jnp.ndarray,
    inv_timescale: jnp.ndarray,
    mul: float | jnp.ndarray = 1.0,
) -> jnp.ndarray:
    """PostQKType::HalfRope: rotate only the first half of the vector, then
    scale everything (gemma/attention.cc:89-95)."""
    half = x.shape[-1] // 2
    rotated = rope(x[..., :half], pos, inv_timescale)
    out = jnp.concatenate([rotated, x[..., half:]], axis=-1)
    return (out.astype(jnp.float32) * jnp.float32(mul)).astype(x.dtype)


def embedding_scaling(model_dim: int) -> float:
    """sqrt(model_dim) rounded to bf16 (gemma/gemma.cc:119-123)."""
    return float(
        np.float32(np.sqrt(np.float32(model_dim))).astype(jnp.bfloat16.dtype)
    )


def softmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Max-subtracted softmax in f32 (ops-inl.h:1125-1171)."""
    xf = x.astype(jnp.float32)
    m = jnp.max(xf, axis=axis, keepdims=True)
    e = jnp.exp(xf - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)


def log_softmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    m = jnp.max(xf, axis=axis, keepdims=True)
    shifted = xf - m
    return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=axis, keepdims=True))


def avg_pool_4x4(x: jnp.ndarray) -> jnp.ndarray:
    """4x4 average pooling over row vectors for Gemma3 vision
    (ops-inl.h:1403-1441): [4096, D] (64x64 grid) -> [256, D] (16x16)."""
    rows, cols = x.shape
    grid = int(np.sqrt(rows))
    assert grid * grid == rows and grid % 4 == 0
    out_dim = grid // 4
    x4 = x.reshape(out_dim, 4, out_dim, 4, cols)
    return jnp.mean(x4.astype(jnp.float32), axis=(1, 3)).reshape(
        out_dim * out_dim, cols
    ).astype(x.dtype)
