"""Attention (maps gemma/attention.cc + flash_attention.cc).

XLA-native batched attention over the ring KV cache: the score/softmax/
weighted-sum runs as dense einsums with a position mask, which XLA fuses
well on the MXU; the Pallas flash-attention kernel (ops/flash_attention.py)
replaces the inner loop for long sequences.

Semantics mirrored from the reference:
  - GQA: `heads` query heads share `kv_heads` KV heads in groups
    (attention.cc:184).
  - Sliding window: keys from pos - min(window-1, pos) .. pos
    (attention.cc:167-170).
  - Prefix-LM: last attendable position extends to prefix_end - 1
    (attention.cc:207-211), giving bidirectional attention in the prefix.
  - Optional score soft cap then exact softmax (attention.cc:156-159).
  - Ring wraparound: cache row = pos % seq_len; a row is valid only for the
    newest absolute position mapping to it (attention.cc:60-72).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gemma_tpu.ops.ops import soft_cap as soft_cap_op

NEG_INF = -2.3819763e38  # matches HWY LowestValue<float> scale of masking


def ring_key_positions(q_pos: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """Absolute position of each cache row, given the newest position.

    q_pos: [B] or [B, T] newest absolute position per query (the decode/
    prefill token's own position).  Returns key_abs: [..., seq_len] where
    key_abs[..., s] is the absolute position whose ring row is `s` that is
    <= q_pos (the only candidate that can be live).
    """
    s = jnp.arange(seq_len, dtype=jnp.int32)
    q = q_pos[..., None].astype(jnp.int32)
    return q - ((q % seq_len - s) % seq_len)


def attention_mask(
    q_pos: jnp.ndarray,
    seq_len: int,
    window: int,
    prefix_end: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """Boolean [.., T, S] mask of attendable cache rows.

    q_pos:      [B, T] absolute query positions
    window:     attention window size for this layer
    prefix_end: [B] or scalar; >0 enables prefix-LM bidirectionality.

    The ring rows are reconstructed from the *newest* position of the step
    (all of this step's K/V are written before attention runs), so prefix-LM
    queries can attend forward to rows ahead of their own position.
    """
    newest = jnp.max(q_pos, axis=-1)  # [B]
    key_abs = ring_key_positions(newest, seq_len)[:, None, :]  # [B, 1, S]
    start = q_pos - jnp.minimum(jnp.int32(window - 1), q_pos)  # [B, T]
    last = q_pos
    if not (isinstance(prefix_end, int) and prefix_end == 0):
        pe = jnp.asarray(prefix_end, jnp.int32)
        last = jnp.maximum(last, (pe[..., None] if pe.ndim == 1 else pe) - 1)
    ok = (key_abs >= start[..., None]) & (key_abs <= last[..., None])
    return ok & (key_abs >= 0)


def dot_softmax_weighted_sum(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask: jnp.ndarray,
    att_cap: float = 0.0,
) -> jnp.ndarray:
    """The DotSoftmaxWeightedSum analog (attention.cc:131-163), batched.

    q:        [B, T, heads, D] (already RoPE'd and scaled)
    k_cache:  [B, kv_heads, S, D]
    v_cache:  [B, kv_heads, S, D]
    mask:     [B, T, S] boolean
    returns:  [B, T, heads, D] f32

    Dots run at the cache dtype (bf16 in production — MXU-native, and
    numerically identical to the Pallas decode kernel; f32 caches, as the
    tests use, keep full-precision dots), accumulating in f32.
    """
    b, t, heads, d = q.shape
    kv_heads = k_cache.shape[1]
    groups = heads // kv_heads
    # Round operands to the cache dtype (matching the Pallas kernel's MXU
    # inputs), then accumulate in f32.  The f32 upcast keeps CPU XLA happy
    # (it lacks a bf16 x bf16 -> f32 dot) without changing the products.
    qg = (q.reshape(b, t, kv_heads, groups, d).astype(k_cache.dtype)
          .astype(jnp.float32))
    scores = jnp.einsum("btkgd,bksd->btkgs", qg,
                        k_cache.astype(jnp.float32))
    if att_cap:
        scores = soft_cap_op(att_cap, scores)
    scores = jnp.where(mask[:, :, None, None, :], scores, NEG_INF)
    # Exact softmax in f32 (ops-inl.h:1125-1171).
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = ((e / jnp.sum(e, axis=-1, keepdims=True))
             .astype(k_cache.dtype).astype(jnp.float32))
    out = jnp.einsum("btkgs,bksd->btkgd", probs,
                     v_cache.astype(jnp.float32))
    return out.reshape(b, t, heads, d)


def dot_softmax_weighted_sum_q(
    q: jnp.ndarray,
    k_codes: jnp.ndarray,
    v_codes: jnp.ndarray,
    scale_k: jnp.ndarray,
    scale_v: jnp.ndarray,
    mask: jnp.ndarray,
    att_cap: float = 0.0,
) -> jnp.ndarray:
    """dot_softmax_weighted_sum over an int8-quantized KV cache.

    k_codes, v_codes: [B, kv_heads, S, D] i8 raw codes
    scale_k, scale_v: [B, kv_heads, S] f32 per-(position, head) scales

    Output-scaled like the Pallas decode kernel (ops/kv_quant.py): scores
    pick up scale_k per key column after the raw-code dot, and scale_v
    folds into the probabilities before the weighted-V dot, so the [S, D]
    panels are never dequantized element-wise.  Dots run q@bf16 x codes@
    bf16 (i8 codes are exact in bf16), accumulating in f32, matching the
    kernel's MXU inputs bit-for-bit.
    """
    b, t, heads, d = q.shape
    kv_heads = k_codes.shape[1]
    groups = heads // kv_heads
    qg = (q.reshape(b, t, kv_heads, groups, d).astype(jnp.bfloat16)
          .astype(jnp.float32))
    scores = jnp.einsum("btkgd,bksd->btkgs", qg,
                        k_codes.astype(jnp.float32))
    scores = scores * scale_k[:, None, :, None, :]
    if att_cap:
        scores = soft_cap_op(att_cap, scores)
    scores = jnp.where(mask[:, :, None, None, :], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    probs = ((probs * scale_v[:, None, :, None, :])
             .astype(jnp.bfloat16).astype(jnp.float32))
    out = jnp.einsum("btkgs,bksd->btkgd", probs,
                     v_codes.astype(jnp.float32))
    return out.reshape(b, t, heads, d)
