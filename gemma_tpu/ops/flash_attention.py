"""Pallas flash attention for the prefill phase
(maps gemma/flash_attention.{h,cc} — streaming/online softmax).

The XLA prefill path materializes [B, T, KVH, G, S] score tensors (1 GB+
per layer at T=256, S=8K); this kernel streams S blocks with the online
softmax recurrence (flash_attention.cc:537-590 documents the same idea for
CPU register tiles), keeping one [bt*G, bs] tile live:

  grid (B, KVH, T/bt, S/bs), S innermost ("arbitrary"):
    m' = max(m, rowmax(scores));  p = exp(scores - m')
    l  = l * exp(m - m') + rowsum(p)
    acc= acc * exp(m - m') + p @ V
  out = acc / l at the last S block.

Ring/window/prefix mask semantics are identical to
ops/attention.py:attention_mask (key_abs reconstruction from the newest
position; prefix-LM extends `last` to prefix_end - 1; garbage rows
s >= seq_len masked).  Numerics: bf16 MXU dots with f32 accumulation and
an exact f32 softmax — the same contract the reference's
flash_attention_test.cc:101-171 asserts at 1e-5 vs the naive path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.3819763e38


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _flash_kernel(groups: int, seq_len: int, window: int, att_cap: float,
                  bt: int, bs: int, n_sblocks: int, quant: bool,
                  *refs):
    if quant:
        (newest_ref, pe_ref, base_ref, q_ref, k_ref, v_ref, sck_ref,
         scv_ref, o_ref, acc_ref, m_ref, l_ref) = refs
    else:
        (newest_ref, pe_ref, base_ref, q_ref, k_ref, v_ref, o_ref,
         acc_ref, m_ref, l_ref) = refs
        sck_ref = scv_ref = None
    b = pl.program_id(0)
    tb = pl.program_id(2)
    sb = pl.program_id(3)

    @pl.when(sb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    rows = bt * groups
    k = k_ref[0, 0, 0, 0]  # [bs, D]
    v = v_ref[0, 0, 0, 0]
    # i8 codes are exact in bf16 (scales apply to the outputs below);
    # f32 pools stay f32 so kv_kind="f32" reference-parity runs measure
    # true f32 attention, not silently-bf16 (advisor round-2 medium).
    cdt = jnp.float32 if (not quant and k.dtype == jnp.float32) \
        else jnp.bfloat16
    q = q_ref[0, 0].astype(cdt)  # [rows, D], already t-major
    k = k.astype(cdt)
    v = v.astype(cdt)
    # Zero V rows past the array: the trailing S block may read
    # out-of-bounds VMEM garbage under NATIVE lowering (interpret mode
    # zero-pads), and 0 * NaN from the p@V dot would poison the
    # accumulator even though p is 0 there.  K needs no guard: garbage
    # scores are replaced by NEG_INF in the masked where below.
    s_sub = sb * bs + jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)
    v = jnp.where(s_sub < seq_len, v, 0)

    # Mask (see attention_mask): absolute position of each cache row.
    # Built directly at [rows, bs] with row -> t = row // groups (q rows are
    # t-major), avoiding a sublane-interleaving broadcast+reshape.
    newest = newest_ref[b]
    pe = pe_ref[b]
    s_idx = sb * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
    key_abs = newest - ((newest % seq_len - s_idx) % seq_len)
    # Query positions are contiguous per chunk: base[b] + chunk offset.
    qpos = (base_ref[b] + tb * bt
            + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // groups)
    start = qpos - jnp.minimum(jnp.int32(window - 1), qpos)
    last = jnp.maximum(qpos, pe - 1)
    ok = (key_abs >= start) & (key_abs <= last) & (s_idx < seq_len) \
        & (key_abs >= 0)  # [rows, bs]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if quant:
        # Output scaling (ops/kv_quant.py): one f32 scale per key column.
        # The scale blocks share V's OOB hazard: the trailing S block of
        # the [1, s_alloc] scale row reads undefined VMEM under native
        # lowering, and 0 * NaN poisons p/acc — zero the invalid lanes.
        sck = jnp.where(s_idx < seq_len, sck_ref[0, 0, 0, 0], 0.0)
        scores = scores * sck  # [1, bs] broadcast
    if att_cap:
        scores = att_cap * jnp.tanh(scores / att_cap)
    scores = jnp.where(ok, scores, NEG_INF)

    m_old = m_ref[...]  # [rows, 128] lane-replicated
    row_max = jnp.max(scores, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_old, jnp.broadcast_to(row_max, m_old.shape))
    # exp(NEG_INF - NEG_INF) would be NaN for fully-masked rows; the
    # explicit `ok` select keeps p exactly 0 there.
    p = jnp.where(ok, jnp.exp(scores - m_new[:, :1]), 0.0)
    alpha = jnp.exp(m_old - m_new)  # 1 where both -inf (0-0 underflow-safe)
    alpha = jnp.where(m_old == NEG_INF, 0.0, alpha)
    l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), m_old.shape)
    # scale_v folds into the probabilities (NOT into l: the softmax
    # denominator is over unscaled p) before the weighted-V dot; OOB
    # lanes of the scale row are zeroed (same hazard as V above).
    if quant:
        scv = jnp.where(s_idx < seq_len, scv_ref[0, 0, 0, 0], 0.0)
        pv = p * scv
    else:
        pv = p
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + jax.lax.dot_general(
        pv.astype(cdt), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(sb == n_sblocks - 1)
    def _():
        l = l_ref[:, :1]
        out = acc_ref[...] / jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0] = out


@functools.partial(
    jax.jit,
    static_argnames=("groups", "layer_idx", "seq_len", "window", "att_cap",
                     "block_t", "block_s", "interpret"),
)
def _flash_pallas(kv, sc, q, base, newest, pe, groups: int, layer_idx: int,
                  seq_len: int, window: int, att_cap: float, block_t: int,
                  block_s: int, interpret: bool):
    # q: [B, KVH, T*G, D] (t-major rows: row = t * G + g) so kernel blocks
    # are plain 2-D [rows, D] tiles — no in-kernel relayout.
    # sc: per-(position, head) scale shadow [B, L, 2, KVH, 1, s_alloc] when
    # the cache is quantized, else None.
    b, kvh, tg, d = q.shape
    s_alloc = kv.shape[4]
    quant = sc is not None
    t = tg // groups
    bt = min(block_t, t)
    while t % bt:
        bt //= 2
    # bs need not divide s_alloc: Pallas pads the trailing block and the
    # s_idx < seq_len mask excludes whatever the padding contains.
    bs = min(block_s, s_alloc)
    n_sblocks = -(-s_alloc // bs)

    kernel = functools.partial(
        _flash_kernel, groups, seq_len, window, att_cap, bt, bs, n_sblocks,
        quant)
    in_specs = [
        pl.BlockSpec((1, 1, bt * groups, d),
                     lambda i, h, tb, sb, nw, pe, base: (i, h, tb, 0)),
        pl.BlockSpec((1, 1, 1, 1, bs, d),
                     lambda i, h, tb, sb, nw, pe, base: (i, layer_idx, 0, h, sb, 0)),
        pl.BlockSpec((1, 1, 1, 1, bs, d),
                     lambda i, h, tb, sb, nw, pe, base: (i, layer_idx, 1, h, sb, 0)),
    ]
    operands = [q, kv, kv]
    if quant:
        in_specs += [
            pl.BlockSpec((1, 1, 1, 1, 1, bs),
                         lambda i, h, tb, sb, nw, pe, base: (i, layer_idx, 0, h, 0, sb)),
            pl.BlockSpec((1, 1, 1, 1, 1, bs),
                         lambda i, h, tb, sb, nw, pe, base: (i, layer_idx, 1, h, 0, sb)),
        ]
        operands += [sc, sc]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, kvh, t // bt, n_sblocks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, bt * groups, d),
                lambda i, h, tb, sb, nw, pe, base: (i, h, tb, 0)),
            scratch_shapes=[
                pltpu.VMEM((bt * groups, d), jnp.float32),
                pltpu.VMEM((bt * groups, 128), jnp.float32),
                pltpu.VMEM((bt * groups, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, kvh, tg, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(newest, pe, base, *operands)
    return out


def flash_prefill_attention(cache, layer_idx: int, q, positions,
                            window: int, att_cap: float = 0.0,
                            prefix_end=0,
                            use_pallas: bool | None = None,
                            block_t: int = 256, block_s: int = 512,
                            interpret: bool = False) -> jnp.ndarray:
    """Prefill attention over the ring cache.

    q: [B, T, heads, D] (RoPE'd and scaled); positions: [B, T], which must
    be contiguous per query (positions[b, i] == positions[b, 0] + i — the
    engine's chunked prefill always is; the XLA fallback is general).
    Returns [B, T, heads, D] f32.
    """
    pool, idx, ring = cache.pool(layer_idx)
    if use_pallas is None:
        # Mosaic needs lane-aligned head dims; tiny test configs fall back.
        use_pallas = _use_pallas() and q.shape[-1] % 128 == 0
    b, t, heads, d = q.shape
    kvh = pool.shape[3]
    groups = heads // kvh

    if not use_pallas and not interpret:
        from gemma_tpu.ops.attention import (attention_mask,
                                             dot_softmax_weighted_sum,
                                             dot_softmax_weighted_sum_q)

        mask = attention_mask(positions, ring, window, prefix_end)
        if cache.quantized:
            sc = cache.pool_scale(layer_idx)
            return dot_softmax_weighted_sum_q(
                q, pool[:, idx, 0, :, :ring], pool[:, idx, 1, :, :ring],
                sc[:, idx, 0, :, 0, :ring], sc[:, idx, 1, :, 0, :ring],
                mask, att_cap=att_cap)
        k_cache = cache.k_layer(layer_idx)[:, :, : ring]
        v_cache = cache.v_layer(layer_idx)[:, :, : ring]
        return dot_softmax_weighted_sum(q, k_cache, v_cache, mask,
                                        att_cap=att_cap)

    # [B, T, KVH, G, D] -> [B, KVH, T*G, D], rows t-major (host-side
    # transpose; XLA handles this efficiently outside the kernel).
    qg = (q.reshape(b, t, kvh, groups, d)
          .transpose(0, 2, 1, 3, 4).reshape(b, kvh, t * groups, d))
    base = positions[:, 0].astype(jnp.int32)
    newest = jnp.max(positions, axis=-1).astype(jnp.int32)
    if isinstance(prefix_end, int):
        pe = jnp.full((b,), prefix_end, jnp.int32)
    else:
        pe = jnp.asarray(prefix_end, jnp.int32)
    out = _flash_pallas(pool, cache.pool_scale(layer_idx), qg, base,
                        newest, pe, groups, idx, ring, window,
                        float(att_cap), block_t, block_s, interpret)
    # [B, KVH, T*G, D] -> [B, T, heads, D]
    out = (out.reshape(b, kvh, t, groups, d)
           .transpose(0, 2, 1, 3, 4).reshape(b, t, heads, d))
    return out
