"""Ring attention: sequence-parallel prefill attention over the mesh.

The reference has no sequence scaling story — long context is handled
single-node by interleaved local/global layers and a ring-buffer cache
(gemma/attention.cc:60-72, 167-170; README.md:306-311, "32K typical /
128K possible").  SURVEY §5 names the TPU analog this module supplies:
shard the SEQUENCE over the ICI ring and rotate KV shards with
`ppermute` while each chip computes its block — attention memory per
chip drops n× and the KV transfers ride the same links the blockwise
compute hides them behind (Liu et al., "Ring Attention with Blockwise
Transformers"; the public scaling-book collective recipe).

Semantics mirror ops/attention.py exactly — GQA grouping, sliding
window `pos - min(window-1, pos) .. pos`, prefix-LM bidirectional
prefix (attention.cc:207-211), soft cap then exact f32 softmax — but
over LINEAR (non-ring) positions: prefill writes rows 0..S-1 in order,
so row == absolute position.  The online-softmax merge reassociates the
sum, so outputs match the dense path to f32 tolerance, not bit-exactly
(same contract as the reference's FlashAttention vs attention test,
gemma/flash_attention_test.cc:101-171).

Layout contract (what the builder's shard_map enforces):
  q      [B, T, H, D]   T sharded over `axis`
  k, v   [B, S, KH, D]  S sharded over `axis`
  q_pos  [B, T]         absolute positions, sharded with q
  k_pos  [B, S]         absolute positions, sharded with k/v
Batch is replicated over `axis` (shard it over "data" as usual).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

NEG_INF = -2.3819763e38  # ops/attention.py masking value


def _block_mask(q_pos, k_pos, window: int, prefix_end) -> jnp.ndarray:
    """[B, Tl, Sl] attendable mask for one (q-shard, kv-shard) pair.

    Mirrors ops/attention.py:attention_mask over linear positions:
    start = pos - min(window-1, pos); last = max(pos, prefix_end - 1).
    """
    start = q_pos - jnp.minimum(jnp.int32(window - 1), q_pos)  # [B, Tl]
    last = q_pos
    if prefix_end is not None:
        pe = jnp.asarray(prefix_end, jnp.int32)
        last = jnp.maximum(last, (pe[:, None] if pe.ndim == 1 else pe) - 1)
    ka = k_pos[:, None, :]  # [B, 1, Sl]
    return (ka >= start[..., None]) & (ka <= last[..., None]) & (ka >= 0)


def _block_scores(q, k, mask, att_cap: float) -> jnp.ndarray:
    """Masked [B, KH, G, Tl, Sl] scores for one block (f32)."""
    b, t, h, d = q.shape
    kh = k.shape[2]
    qg = (q.reshape(b, t, kh, h // kh, d).astype(k.dtype)
          .astype(jnp.float32))
    scores = jnp.einsum("btkgd,bskd->bkgts", qg, k.astype(jnp.float32))
    if att_cap:
        scores = att_cap * jnp.tanh(scores / att_cap)
    return jnp.where(mask[:, None, None, :, :], scores, NEG_INF)


def _ring_attention_local(q, k, v, q_pos, k_pos, prefix_end, *,
                          window: int, att_cap: float, axis: str):
    """Per-device body: blockwise online softmax + KV ring rotation.

    Runs inside shard_map; all arrays are the local shards.  Each of the
    `n` steps scores the resident KV block and folds it into the running
    (max, denominator, accumulator), then rotates (k, v, k_pos) one hop
    around the ring — after n steps every chip has seen every KV block
    and the partials combine into the exact softmax up to f32 reorder.
    """
    n = jax.lax.axis_size(axis)
    b, t, h, d = q.shape
    kh = k.shape[2]
    g = h // kh
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        k_blk, v_blk, kp_blk, m, l, acc = carry
        mask = _block_mask(q_pos, kp_blk, window, prefix_end)
        s = _block_scores(q, k_blk, mask, att_cap)  # [B,KH,G,Tl,Sl]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # exp under the mask: a fully-masked block (m_new may still be
        # NEG_INF) must contribute exactly zero to l and acc.
        e = jnp.where(mask[:, None, None, :, :],
                      jnp.exp(s - m_new), 0.0)  # [B,KH,G,Tl,Sl]
        alpha = jnp.where(m > NEG_INF / 2, jnp.exp(m - m_new), 0.0)
        l = l * alpha + e.sum(axis=-1, keepdims=True)
        pv = jnp.einsum("bkgts,bskd->bkgtd", e,
                        v_blk.astype(jnp.float32))
        acc = acc * alpha[..., 0, None] + pv
        k_blk, v_blk, kp_blk = jax.lax.ppermute(
            (k_blk, v_blk, kp_blk), axis, perm)
        return (k_blk, v_blk, kp_blk, m_new, l, acc), ()

    m0 = jnp.full((b, kh, g, t, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, kh, g, t, 1), jnp.float32)
    acc0 = jnp.zeros((b, kh, g, t, d), jnp.float32)
    (_, _, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, k_pos, m0, l0, acc0), None, length=n)
    out = acc / jnp.maximum(l[..., 0, None], 1e-30)
    # [B,KH,G,Tl,D] -> [B,Tl,H,D]
    return out.transpose(0, 3, 1, 2, 4).reshape(b, t, h, d)


def build_ring_attention(mesh, axis: str = "model", *, window: int,
                         att_cap: float = 0.0, with_prefix: bool = False):
    """Jitted (q, k, v, q_pos, k_pos[, prefix_end]) -> [B, T, H, D] f32.

    T and S are sharded over `axis` (both must divide by the axis size);
    batch replicates over `axis` — combine with a "data" axis for batch
    sharding.  `window`/`att_cap` are static per layer, like the dense
    path's call sites.
    """
    body = functools.partial(
        _ring_attention_local, window=window, att_cap=att_cap, axis=axis)
    if not with_prefix:
        def body_np(q, k, v, q_pos, k_pos):
            return body(q, k, v, q_pos, k_pos, None)
        fn, extra_in = body_np, []
    else:
        fn, extra_in = body, [P()]
    shard = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None),
                  P(None, axis, None, None), P(None, axis),
                  P(None, axis), *extra_in),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    return jax.jit(shard)
