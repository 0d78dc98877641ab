"""Pallas decode-phase attention + in-place KV row write.

The decode step is HBM-bandwidth-bound on the KV cache: per layer it must
read K and V once ([B, H, S, D] each) and write one new row.  XLA's
batched-einsum lowering runs this ~4x off speed-of-light and its scatter
copies the whole cache; these kernels run at ~85% of SOL (measured v5e)
and write rows in place via input/output aliasing:

  - `kv_write_decode`: grid (B,), read-modify-write of the sublane tile
    containing the target ring row; everything else aliases through
    untouched.  Replaces DotSoftmaxWeightedSum's RowPtrs KV scatter
    (gemma/attention.cc:264-283).
  - `decode_attention`: grid (B,), one (batch, layer) program holds the
    whole [H, S, D] K and V panels in VMEM, computes scores on the MXU,
    applies soft-cap/ring-mask/softmax on the VPU, and the weighted-V
    matmul back on the MXU.  Mirrors the single-token path of
    flash_attention.cc / attention.cc:54-238 (numerically identical to
    ops/attention.py's XLA path, which remains the fallback for prefill
    and CPU).

Quantized (i8) caches use the same kernels with per-(position, head)
scale rows applied to the *outputs* (ops/kv_quant.py): scores pick up
scale_k per key column, and scale_v folds into the probabilities before
the weighted-V dot — the [S, D] panels feed the MXU as raw codes, so i8
halves the attention HBM traffic with ~zero extra VPU work.

Ring/window/prefix semantics match ops/attention.py:attention_mask: a
cache row s holds absolute position key_abs(s) = newest - ((newest mod S -
s) mod S); attendable iff start <= key_abs <= newest and s < seq_len
(the garbage row s == seq_len absorbs padded-slot writes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gemma_tpu.ops.matmul import _sds

NEG_INF = -2.3819763e38  # matches ops/attention.py masking


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _sublane(dtype) -> int:
    """Native sublane tile height for a pool dtype."""
    return {2: 16, 1: 32, 4: 8}[jnp.dtype(dtype).itemsize]


# ---------------------------------------------------------------------------
# In-place KV row write (decode, T == 1).
# ---------------------------------------------------------------------------


def _kv_write_kernel(w: int, lay_ref, rows_ref, new_ref, kv_ref, o_ref):
    b = pl.program_id(0)
    sub = rows_ref[b] % w
    r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, w, 1), 4)
    new = new_ref[...][None, :, :, :, None, :]  # [1,1,2,H,1,D]
    o_ref[...] = jnp.where(r == sub, new.astype(o_ref.dtype), kv_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=0)
def _kv_write_pallas(kv, newkv, rows, layer_idx,
                     interpret: bool = False):
    b, n_layers, _, h, s_alloc, d = kv.shape
    w = _sublane(kv.dtype)
    lay = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    kernel = functools.partial(_kv_write_kernel, w)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 2, h, d), lambda i, lay, rows: (i, 0, 0, 0)),
                pl.BlockSpec(
                    (1, 1, 2, h, w, d),
                    lambda i, lay, rows: (i, lay[0], 0, 0, rows[i] // w, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 2, h, w, d),
                lambda i, lay, rows: (i, lay[0], 0, 0, rows[i] // w, 0),
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(kv.shape, kv.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lay, rows, newkv, kv)


def _kv_write_q_kernel(w: int, h: int, lay_ref, rows_ref, newsc_ref,
                       new_ref, kv_ref, sc_ref, okv_ref, osc_ref):
    b = pl.program_id(0)
    row = rows_ref[b]
    sub = row % w
    r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, w, 1), 4)
    new = new_ref[...][None, :, :, :, None, :]  # [1,1,2,H,1,D]
    okv_ref[...] = jnp.where(r == sub, new.astype(okv_ref.dtype),
                             kv_ref[...])
    # Scale row: lane-masked update per (k/v, head) from SMEM scalars —
    # no cross-layout broadcasts (sublane-dim data never moves to lanes).
    s_alloc = sc_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s_alloc), 1)
    hit = lane == row
    for j in range(2):
        for head in range(h):
            old = sc_ref[0, 0, j, head]  # [1, S]
            osc_ref[0, 0, j, head] = jnp.where(hit, newsc_ref[b, j, head],
                                               old)


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1))
def _kv_write_q_pallas(kv, sc, newkv, newsc, rows, layer_idx,
                       interpret: bool = False):
    b, n_layers, _, h, s_alloc, d = kv.shape
    w = _sublane(kv.dtype)
    lay = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    kernel = functools.partial(_kv_write_q_kernel, w, h)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 2, h, d),
                             lambda i, lay, rows, nsc: (i, 0, 0, 0)),
                pl.BlockSpec(
                    (1, 1, 2, h, w, d),
                    lambda i, lay, rows, nsc: (i, lay[0], 0, 0,
                                               rows[i] // w, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 2, h, 1, sc.shape[-1]),
                    lambda i, lay, rows, nsc: (i, lay[0], 0, 0, 0, 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, 2, h, w, d),
                    lambda i, lay, rows, nsc: (i, lay[0], 0, 0,
                                               rows[i] // w, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 2, h, 1, sc.shape[-1]),
                    lambda i, lay, rows, nsc: (i, lay[0], 0, 0, 0, 0),
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(kv.shape, kv.dtype),
            jax.ShapeDtypeStruct(sc.shape, sc.dtype),
        ],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lay, rows, newsc, newkv, kv, sc)


def kv_write_decode(cache, layer_idx: int, positions, k, v, valid=None,
                    use_pallas: bool | None = None):
    """Write one ring row per query; returns the updated KVCache.

    positions: [B, 1]; k, v: [B, 1, H, D] (f32/bf16 — quantization to the
    pool dtype happens here).  In-place on TPU (the caller must not reuse
    the old cache object — the engine never does).
    """
    if use_pallas is None:
        use_pallas = _use_pallas() and cache.kv.shape[-1] % 128 == 0
    if not use_pallas:
        return cache.update(layer_idx, positions, k, v, valid=valid)

    pool, idx, ring = cache.pool(layer_idx)
    rows = (positions[:, 0] % ring).astype(jnp.int32)
    if valid is not None:
        rows = jnp.where(valid[:, 0], rows, ring)
    newkv = jnp.stack([k[:, 0], v[:, 0]], axis=1)  # [B, 2, H, D]
    if cache.quantized:
        from gemma_tpu.ops.kv_quant import quantize_rows

        codes, scale = quantize_rows(newkv)
        sc_arr = cache.pool_scale(layer_idx)
        new_pool, new_sc = _kv_write_q_pallas(pool, sc_arr, codes, scale,
                                              rows, idx)
        return cache._replace_pool(layer_idx, new_pool, new_sc)
    return cache._replace_pool(
        layer_idx, _kv_write_pallas(pool, newkv.astype(pool.dtype), rows,
                                    idx))


# ---------------------------------------------------------------------------
# Decode attention (T == 1).
# ---------------------------------------------------------------------------


def _decode_att_kernel(h: int, groups: int, seq_len: int, window: int,
                       att_cap: float, s_alloc: int, quant: bool,
                       *refs):
    if quant:
        lay_ref, pos_ref, q_ref, k_ref, v_ref, sck_ref, scv_ref, o_ref = refs
    else:
        lay_ref, pos_ref, q_ref, k_ref, v_ref, o_ref = refs
        sck_ref = scv_ref = None
    b = pl.program_id(0)
    newest = pos_ref[b]
    start = jnp.maximum(newest - (window - 1), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (1, s_alloc), 1)
    key_abs = newest - ((newest % seq_len - s) % seq_len)
    ok = (key_abs >= start) & (key_abs <= newest) & (s < seq_len)
    # i8 codes are exact in bf16; f32 pools stay f32 so kv_kind="f32"
    # parity runs really measure f32 attention (advisor round-2 medium).
    cdt = jnp.float32 if (not quant and k_ref.dtype == jnp.float32) \
        else jnp.bfloat16
    for head in range(h):
        qh = q_ref[0, head].astype(cdt)  # [G, D]
        kh = k_ref[0, 0, 0, head]        # [S, D]
        vh = v_ref[0, 0, 0, head]
        scores = jax.lax.dot_general(
            qh, kh.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, S]
        if quant:
            scores = scores * sck_ref[0, 0, 0, head]  # [1, S] broadcast
        if att_cap:
            scores = att_cap * jnp.tanh(scores / att_cap)
        scores = jnp.where(ok, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / e.sum(axis=-1, keepdims=True)
        if quant:
            probs = probs * scv_ref[0, 0, 0, head]
        oh = jax.lax.dot_general(
            probs.astype(cdt), vh.astype(cdt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, D]
        o_ref[0, head * groups : (head + 1) * groups, :] = oh


@functools.partial(
    jax.jit,
    static_argnames=("seq_len", "window", "att_cap", "interpret"),
)
def _decode_att_pallas(kv, q, pos, layer_idx, seq_len: int,
                       window: int, att_cap: float,
                       interpret: bool = False):
    b, n_layers, _, h, s_alloc, d = kv.shape
    groups = q.shape[2]
    lay = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    kernel = functools.partial(
        _decode_att_kernel, h, groups, seq_len, window, att_cap, s_alloc,
        False)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, groups, d),
                             lambda i, lay, pos: (i, 0, 0, 0)),
                pl.BlockSpec(
                    (1, 1, 1, h, s_alloc, d),
                    lambda i, lay, pos: (i, lay[0], 0, 0, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, h, s_alloc, d),
                    lambda i, lay, pos: (i, lay[0], 1, 0, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, h * groups, d), lambda i, lay, pos: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * groups, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lay, pos, q, kv, kv)


@functools.partial(
    jax.jit,
    static_argnames=("seq_len", "window", "att_cap", "interpret"),
)
def _decode_att_q_pallas(kv, sc, q, pos, layer_idx, seq_len: int,
                         window: int, att_cap: float,
                         interpret: bool = False):
    b, n_layers, _, h, s_alloc, d = kv.shape
    groups = q.shape[2]
    s_sc = sc.shape[-1]
    lay = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    kernel = functools.partial(
        _decode_att_kernel, h, groups, seq_len, window, att_cap, s_alloc,
        True)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, groups, d),
                             lambda i, lay, pos: (i, 0, 0, 0)),
                pl.BlockSpec(
                    (1, 1, 1, h, s_alloc, d),
                    lambda i, lay, pos: (i, lay[0], 0, 0, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, h, s_alloc, d),
                    lambda i, lay, pos: (i, lay[0], 1, 0, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, h, 1, s_sc),
                    lambda i, lay, pos: (i, lay[0], 0, 0, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, h, 1, s_sc),
                    lambda i, lay, pos: (i, lay[0], 1, 0, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, h * groups, d), lambda i, lay, pos: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * groups, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lay, pos, q, kv, kv, sc, sc)


# ---------------------------------------------------------------------------
# Fused KV write + attention (decode, T == 1): one kernel per layer.
# ---------------------------------------------------------------------------


def _pe_apply(x, pos, inv_ts, mul: float, mode: int):
    """In-kernel position encoding — bit-matches ops.rope/half_rope on
    f32 inputs (same formula, same op order; ops/ops.py:75-111)."""
    posf = pos.astype(jnp.float32)
    if mode == 0:  # PostQKType.ROPE: split-halves rotation, mul first
        half = x.shape[-1] // 2
        theta = posf * inv_ts  # [half]
        sin, cos = jnp.sin(theta), jnp.cos(theta)
        xm = x * jnp.float32(mul)
        x0, x1 = xm[..., :half], xm[..., half:]
        return jnp.concatenate([x0 * cos - x1 * sin,
                                x0 * sin + x1 * cos], axis=-1)
    # PostQKType.HALF_ROPE: rotate the first half at mul=1, then scale
    # everything (gemma/attention.cc:89-95).
    half = x.shape[-1] // 2
    q = x[..., :half]
    qh = half // 2
    theta = posf * inv_ts  # [qh]
    sin, cos = jnp.sin(theta), jnp.cos(theta)
    q0, q1 = q[..., :qh], q[..., qh:]
    rot = jnp.concatenate([q0 * cos - q1 * sin,
                           q0 * sin + q1 * cos], axis=-1)
    return jnp.concatenate([rot, x[..., half:]], axis=-1) * jnp.float32(mul)


def _krms(x, w):
    """(1 + w) RMSNorm over the last axis, f32 (ops/ops.py:30-39)."""
    mul = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-6)
    m = x * mul
    return m + m * w


def _decode_fused_kernel(h: int, groups: int, seq_len: int, window: int,
                         att_cap: float, s_alloc: int, w: int, quant: bool,
                         pe: int | None, qscale: float, has_kn: bool,
                         has_qn: bool, *refs):
    """Write the new ring row AND attend in ONE program: the row write
    reuses _kv_write_kernel's sublane-tile read-modify-write, while the
    score/value contributions of the just-written row come from the NEW
    K/V held in VMEM (the panel blocks may hold the stale row — any
    HBM write/read ordering is safe because the kernel never depends on
    the panel's value at that row).  With pe set, the layer's remaining
    elementwise stages also run here: optional QK RMSNorms, RoPE of q
    and the new k (query scale folded), and — for i8 pools — the
    per-(k/v, head) row quantization.  One kernel per layer replaces
    write + attend + the rope/norm elementwise kernel (gemma.cc:83-116
    runs the whole pass per layer for the same reason)."""
    i = 0
    lay_ref = refs[i]; i += 1
    rows_ref = refs[i]; i += 1
    pos_ref = refs[i]; i += 1
    newsc_ref = None
    if quant and pe is None:
        newsc_ref = refs[i]; i += 1  # host-quantized scales
    q_ref = refs[i]; i += 1
    new_ref = refs[i]; i += 1
    its_ref = kn_ref = qn_ref = None
    if pe is not None:
        its_ref = refs[i]; i += 1
        if has_kn:
            kn_ref = refs[i]; i += 1
        if has_qn:
            qn_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    sck_ref = scv_ref = None
    if quant:
        sck_ref = refs[i]; i += 1
        scv_ref = refs[i]; i += 1
    kvtile_ref = refs[i]; i += 1
    sctile_ref = None
    if quant:
        sctile_ref = refs[i]; i += 1
    o_ref = refs[i]; i += 1
    okv_ref = refs[i]; i += 1
    osc_ref = refs[i] if quant else None

    b = pl.program_id(0)
    row = rows_ref[b]
    pos_b = pos_ref[b]

    # --- position-encode (and quantize) the new K/V row ---
    scale_k = scale_v = None  # [H, 1] f32 when quant
    if pe is not None:
        kraw = new_ref[0, 0].astype(jnp.float32)  # [H, D]
        if has_kn:
            kraw = _krms(kraw, kn_ref[...][0].astype(jnp.float32))
        kraw = _pe_apply(kraw, pos_b, its_ref[...][0], 1.0, pe)
        vraw = new_ref[0, 1].astype(jnp.float32)
        if quant:
            # quantize_rows semantics (ops/kv_quant.py:26-37), per head.
            amax_k = jnp.max(jnp.abs(kraw), axis=-1, keepdims=True)
            amax_v = jnp.max(jnp.abs(vraw), axis=-1, keepdims=True)
            scale_k, scale_v = amax_k / 127.0, amax_v / 127.0
            inv_k = jnp.where(scale_k > 0.0, 1.0 / scale_k, 0.0)
            inv_v = jnp.where(scale_v > 0.0, 1.0 / scale_v, 0.0)
            new_k = jnp.rint(kraw * inv_k).astype(jnp.int8)
            new_v = jnp.rint(vraw * inv_v).astype(jnp.int8)
        else:
            new_k = kraw.astype(okv_ref.dtype)
            new_v = vraw.astype(okv_ref.dtype)
    else:
        new_k, new_v = new_ref[0, 0], new_ref[0, 1]

    # --- in-place row write (the _kv_write_kernel body) ---
    sub = row % w
    r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, w, 1), 4)
    # [2, H, D] -> [1, 1, 2, H, 1, D]; okv block is [1, 1, 2, h, w, d].
    new = jnp.stack([new_k, new_v])[None, None, :, :, None, :]
    okv_ref[...] = jnp.where(r == sub, new.astype(okv_ref.dtype),
                             kvtile_ref[...])
    if quant:
        s_sc = sctile_ref.shape[-1]
        lane_sc = jax.lax.broadcasted_iota(jnp.int32, (1, s_sc), 1)
        hit = lane_sc == row
        for j, sc in ((0, scale_k), (1, scale_v)):
            if pe is None:
                for head in range(h):
                    osc_ref[0, 0, j, head] = jnp.where(
                        hit, newsc_ref[b, j, head],
                        sctile_ref[0, 0, j, head])
            else:
                for head in range(h):
                    osc_ref[0, 0, j, head] = jnp.where(
                        hit, sc[head, 0], sctile_ref[0, 0, j, head])

    # --- attention with the new row substituted in-compute ---
    newest = pos_b
    start = jnp.maximum(newest - (window - 1), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (1, s_alloc), 1)
    key_abs = newest - ((newest % seq_len - s) % seq_len)
    ok = (key_abs >= start) & (key_abs <= newest) & (s < seq_len)
    at_row = s == row
    cdt = jnp.float32 if (not quant and k_ref.dtype == jnp.float32) \
        else jnp.bfloat16
    for head in range(h):
        qh = q_ref[0, head].astype(jnp.float32)  # [G, D]
        if pe is not None:
            if has_qn:
                qh = _krms(qh, qn_ref[...][0].astype(jnp.float32))
            qh = _pe_apply(qh, pos_b, its_ref[...][0], qscale, pe)
        qh = qh.astype(cdt)
        kh = k_ref[0, 0, 0, head]        # [S, D] (stale at row)
        vh = v_ref[0, 0, 0, head]
        nk = new_k[head].astype(cdt)     # [D]
        nv = new_v[head].astype(cdt)
        if quant:
            nsk = scale_k[head, 0] if pe is not None \
                else newsc_ref[b, 0, head]
            nsv = scale_v[head, 0] if pe is not None \
                else newsc_ref[b, 1, head]
        scores = jax.lax.dot_general(
            qh, kh.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, S]
        new_score = jax.lax.dot_general(
            qh, nk.reshape(1, -1), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, 1]
        if quant:
            sck = jnp.where(at_row, nsk, sck_ref[0, 0, 0, head])  # [1, S]
            scores = jnp.where(at_row, new_score, scores) * sck
        else:
            scores = jnp.where(at_row, new_score, scores)
        if att_cap:
            scores = att_cap * jnp.tanh(scores / att_cap)
        scores = jnp.where(ok, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / e.sum(axis=-1, keepdims=True)
        if quant:
            scv = jnp.where(at_row, nsv, scv_ref[0, 0, 0, head])
            probs = probs * scv
        # Split the weighted-V sum: panel rows (row's prob zeroed) + the
        # new row's V scaled by its probability.
        p_row = jnp.sum(jnp.where(at_row, probs, 0.0), axis=-1,
                        keepdims=True)  # [G, 1]
        probs_z = jnp.where(at_row, 0.0, probs)
        oh = jax.lax.dot_general(
            probs_z.astype(cdt), vh.astype(cdt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, D]
        # Round prob and V to cdt first — the composed kernel's MXU dot
        # multiplies cdt operands into f32, so the new row's product must
        # take the same rounding to stay within reorder-only error.
        oh = oh + (p_row.astype(cdt).astype(jnp.float32)
                   * nv.reshape(1, -1).astype(jnp.float32))
        o_ref[0, head * groups : (head + 1) * groups, :] = oh


def _decode_fused_packed_kernel(heads: int, h: int, groups: int,
                                seq_len: int, window: int, att_cap: float,
                                s_alloc: int, w: int, quant: bool, pe: int,
                                qscale: float, has_kn: bool, has_qn: bool,
                                *refs):
    """_decode_fused_kernel, but consuming the qkv GEMM's output DIRECTLY.

    The unrolled decode step's remaining fixed overhead is XLA glue
    between the qkv GEMM and this kernel (q/kv slice + reshape + stack
    relayouts) and between this kernel and the att_w GEMM (the [B, H, D]
    -> [B, H*D] reshape + bf16 cast) — ~2 launch-bound fusions per layer
    at the measured ~2.7 us/kernel floor (docs/PERF.md round-5 #6).  This
    variant takes the GEMM's [1, (heads + 2*kv_heads)*D] row per batch
    program LANE-MAJOR and addresses each head's q/k/v as a static,
    tile-aligned lane slice (no sublane relayout anywhere — the per-head
    q rows become [1, D] MXU matvecs, identical math row-for-row), and
    writes the attention output as the att_w GEMM's native [1, heads*D]
    bf16 A-row.  The surrounding GEMMs keep their tuned tiles untouched.

    Column order matches gemma.py's qkv_cat layout: q heads first
    (kv-major: head = kv_head*groups + g), then per-kv-head interleaved
    K/V (attention.cc:288-320's QKV ordering).  Semantics otherwise
    identical to _decode_fused_kernel (rope REQUIRED: pe is not None)."""
    i = 0
    lay_ref = refs[i]; i += 1  # noqa: F841 — consumed by the index maps
    rows_ref = refs[i]; i += 1
    pos_ref = refs[i]; i += 1
    qkv_ref = refs[i]; i += 1
    its_ref = refs[i]; i += 1
    kn_ref = qn_ref = None
    if has_kn:
        kn_ref = refs[i]; i += 1
    if has_qn:
        qn_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    sck_ref = scv_ref = None
    if quant:
        sck_ref = refs[i]; i += 1
        scv_ref = refs[i]; i += 1
    kvtile_ref = refs[i]; i += 1
    sctile_ref = None
    if quant:
        sctile_ref = refs[i]; i += 1
    o_ref = refs[i]; i += 1
    okv_ref = refs[i]; i += 1
    osc_ref = refs[i] if quant else None

    d = k_ref.shape[-1]
    b = pl.program_id(0)
    row = rows_ref[b]
    pos_b = pos_ref[b]
    its = its_ref[...][0]

    def lanes(r0: int) -> jnp.ndarray:
        """Row r0 of the GEMM output as a [1, D] lane slice."""
        return qkv_ref[:, r0 * d:(r0 + 1) * d]

    # Rebuild the small sublane tiles the batched math wants from the
    # lane-major GEMM row.  These concats touch <= 2 vregs per row — the
    # v1 packed kernel skipped them and ran every score/softmax stage as
    # [1, S] singles instead, which DOUBLED the VPU vreg work and the
    # MXU dot count across B*L program-steps and measured 0.991x (the
    # glue win must not be spent inside the kernel).
    kraw = jnp.concatenate(
        [lanes(heads + 2 * hh) for hh in range(h)], axis=0
    ).astype(jnp.float32)  # [H, D]
    vraw = jnp.concatenate(
        [lanes(heads + 2 * hh + 1) for hh in range(h)], axis=0
    ).astype(jnp.float32)
    qs = []  # per kv head: [G, D] f32 (raw; norm+rope below)
    for head in range(h):
        rows_q = [lanes(head * groups + g) for g in range(groups)]
        qh = rows_q[0] if groups == 1 else jnp.concatenate(rows_q, axis=0)
        qs.append(qh.astype(jnp.float32))

    # --- position-encode (and quantize) the new K/V row (same math as
    # _decode_fused_kernel's pe-path) ---
    scale_k = scale_v = None  # [H, 1] f32 when quant
    if has_kn:
        kraw = _krms(kraw, kn_ref[...][0].astype(jnp.float32))
    kraw = _pe_apply(kraw, pos_b, its, 1.0, pe)
    if quant:
        # quantize_rows semantics (ops/kv_quant.py:26-37), per head.
        amax_k = jnp.max(jnp.abs(kraw), axis=-1, keepdims=True)
        amax_v = jnp.max(jnp.abs(vraw), axis=-1, keepdims=True)
        scale_k, scale_v = amax_k / 127.0, amax_v / 127.0
        inv_k = jnp.where(scale_k > 0.0, 1.0 / scale_k, 0.0)
        inv_v = jnp.where(scale_v > 0.0, 1.0 / scale_v, 0.0)
        new_k = jnp.rint(kraw * inv_k).astype(jnp.int8)
        new_v = jnp.rint(vraw * inv_v).astype(jnp.int8)
    else:
        new_k = kraw.astype(okv_ref.dtype)
        new_v = vraw.astype(okv_ref.dtype)

    # --- in-place row write (the _kv_write_kernel body) ---
    sub = row % w
    r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, w, 1), 4)
    new = jnp.stack([new_k, new_v])[None, None, :, :, None, :]
    okv_ref[...] = jnp.where(r == sub, new.astype(okv_ref.dtype),
                             kvtile_ref[...])
    if quant:
        s_sc = sctile_ref.shape[-1]
        lane_sc = jax.lax.broadcasted_iota(jnp.int32, (1, s_sc), 1)
        hit = lane_sc == row
        for j, sc in ((0, scale_k), (1, scale_v)):
            for head in range(h):
                osc_ref[0, 0, j, head] = jnp.where(
                    hit, sc[head, 0], sctile_ref[0, 0, j, head])

    # --- attention with the new row substituted in-compute ---
    newest = pos_b
    start = jnp.maximum(newest - (window - 1), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (1, s_alloc), 1)
    key_abs = newest - ((newest % seq_len - s) % seq_len)
    ok = (key_abs >= start) & (key_abs <= newest) & (s < seq_len)
    at_row = s == row
    cdt = jnp.float32 if (not quant and k_ref.dtype == jnp.float32) \
        else jnp.bfloat16
    for head in range(h):
        qh = qs[head]
        if has_qn:
            qh = _krms(qh, qn_ref[...][0].astype(jnp.float32))
        qh = _pe_apply(qh, pos_b, its, qscale, pe).astype(cdt)
        kh = k_ref[0, 0, 0, head]        # [S, D] (stale at row)
        vh = v_ref[0, 0, 0, head]
        nk = new_k[head].astype(cdt)     # [D]
        nv = new_v[head].astype(cdt)
        if quant:
            nsk, nsv = scale_k[head, 0], scale_v[head, 0]
        scores = jax.lax.dot_general(
            qh, kh.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, S]
        new_score = jax.lax.dot_general(
            qh, nk.reshape(1, -1), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, 1]
        if quant:
            sck = jnp.where(at_row, nsk, sck_ref[0, 0, 0, head])  # [1, S]
            scores = jnp.where(at_row, new_score, scores) * sck
        else:
            scores = jnp.where(at_row, new_score, scores)
        if att_cap:
            scores = att_cap * jnp.tanh(scores / att_cap)
        scores = jnp.where(ok, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / e.sum(axis=-1, keepdims=True)
        if quant:
            scv = jnp.where(at_row, nsv, scv_ref[0, 0, 0, head])
            probs = probs * scv
        p_row = jnp.sum(jnp.where(at_row, probs, 0.0), axis=-1,
                        keepdims=True)  # [G, 1]
        probs_z = jnp.where(at_row, 0.0, probs)
        oh = jax.lax.dot_general(
            probs_z.astype(cdt), vh.astype(cdt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, D]
        oh = oh + (p_row.astype(cdt).astype(jnp.float32)
                   * nv.reshape(1, -1).astype(jnp.float32))
        oh = oh.astype(o_ref.dtype)
        for g in range(groups):
            qoff = (head * groups + g) * d
            o_ref[:, qoff:qoff + d] = oh[g:g + 1, :]


def pick_s_block(s_alloc: int, sublane: int, row_bytes: int,
                 min_dma: int = 64 << 10,
                 lane_multiple: int | None = None) -> int | None:
    """Tile-legal DIVISOR of s_alloc for panel blocking, or None.

    The S-blocked kernel clamps dead panels' block index to the live
    frontier, so its HBM reads scale with the ring OCCUPANCY instead of
    the allocation (the one-shot kernel reads all s_alloc rows every
    step — 2x the live span at a half-full ring, docs/PERF.md §7).
    Non-dividing blocks are out: they read UNDEFINED VMEM under native
    lowering (CLAUDE.md lore).  For QUANTIZED pools pass
    lane_multiple=128: the [1, s_alloc] scale rows block S on the LANE
    dim, where Mosaic requires 128-multiples (KVCache pads s_alloc to
    128 rows so such divisors exist).  Prefers the smallest block whose
    K-panel DMA stays >= min_dma (fine-grained clamping at full DMA
    efficiency); row_bytes = kv_heads * qkv_dim * itemsize.  None = no
    useful split."""
    step = lane_multiple or sublane
    cands = [bs for bs in range(step, s_alloc, step)
             if s_alloc % bs == 0 and s_alloc // bs >= 2]
    if not cands:
        return None
    good = [bs for bs in cands if bs * row_bytes >= min_dma]
    return min(good) if good else max(cands)


def _decode_fused_sblocked_kernel(
        h: int, groups: int, seq_len: int, window: int, att_cap: float,
        s_alloc: int, bs: int, w: int, quant: bool, pe: int | None,
        qscale: float, has_kn: bool, has_qn: bool, *refs):
    """S-BLOCKED fused write+attend: grid (B, s_alloc/bs) with an online
    softmax across panels.  The K/V/scale panel block indices are CLAMPED
    to the live frontier (min(j, live_panel)) in the index maps — Mosaic
    skips the DMA when consecutive grid steps name the same block, so
    beyond-frontier panels cost nothing and the kernel's HBM traffic is
    proportional to min(pos+1, seq_len) instead of s_alloc.

    Numerics: same masks/softcap/substitution as _decode_fused_kernel,
    but the softmax normalizes ONCE at the end from the online (m, s)
    state — output differs from the one-shot kernel only by f32
    rounding order (the flash-attention class of drift; tolerance-
    checked in tests + scripts/tpu_parity.py)."""
    i = 0
    lay_ref = refs[i]; i += 1
    rows_ref = refs[i]; i += 1
    pos_ref = refs[i]; i += 1
    newsc_ref = None
    if quant and pe is None:
        newsc_ref = refs[i]; i += 1
    q_ref = refs[i]; i += 1
    new_ref = refs[i]; i += 1
    its_ref = kn_ref = qn_ref = None
    if pe is not None:
        its_ref = refs[i]; i += 1
        if has_kn:
            kn_ref = refs[i]; i += 1
        if has_qn:
            qn_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    sck_ref = scv_ref = None
    if quant:
        sck_ref = refs[i]; i += 1
        scv_ref = refs[i]; i += 1
    kvtile_ref = refs[i]; i += 1
    sctile_ref = None
    if quant:
        sctile_ref = refs[i]; i += 1
    o_ref = refs[i]; i += 1
    okv_ref = refs[i]; i += 1
    osc_ref = refs[i] if quant else None
    m_sc, s_sc_ref, er_sc, acc_sc = refs[-4:]

    b = pl.program_id(0)
    j = pl.program_id(1)
    nj = s_alloc // bs
    row = rows_ref[b]
    pos_b = pos_ref[b]
    hi = jnp.minimum(pos_b, seq_len - 1) // bs
    live = j <= hi

    # --- encode the new K/V row (cheap [H, D] work, recomputed per j so
    # no cross-panel stash is needed) ---
    scale_k = scale_v = None
    if pe is not None:
        kraw = new_ref[0, 0].astype(jnp.float32)
        if has_kn:
            kraw = _krms(kraw, kn_ref[...][0].astype(jnp.float32))
        kraw = _pe_apply(kraw, pos_b, its_ref[...][0], 1.0, pe)
        vraw = new_ref[0, 1].astype(jnp.float32)
        if quant:
            amax_k = jnp.max(jnp.abs(kraw), axis=-1, keepdims=True)
            amax_v = jnp.max(jnp.abs(vraw), axis=-1, keepdims=True)
            scale_k, scale_v = amax_k / 127.0, amax_v / 127.0
            inv_k = jnp.where(scale_k > 0.0, 1.0 / scale_k, 0.0)
            inv_v = jnp.where(scale_v > 0.0, 1.0 / scale_v, 0.0)
            new_k = jnp.rint(kraw * inv_k).astype(jnp.int8)
            new_v = jnp.rint(vraw * inv_v).astype(jnp.int8)
        else:
            new_k = kraw.astype(okv_ref.dtype)
            new_v = vraw.astype(okv_ref.dtype)
    else:
        new_k, new_v = new_ref[0, 0], new_ref[0, 1]

    # --- row write + state init, once per batch program ---
    @pl.when(j == 0)
    def _():
        sub = row % w
        r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, w, 1), 4)
        new = jnp.stack([new_k, new_v])[None, None, :, :, None, :]
        okv_ref[...] = jnp.where(r == sub, new.astype(okv_ref.dtype),
                                 kvtile_ref[...])
        if quant:
            n_lanes = sctile_ref.shape[-1]
            lane_sc = jax.lax.broadcasted_iota(jnp.int32, (1, n_lanes), 1)
            hit = lane_sc == row
            for c, sc in ((0, scale_k), (1, scale_v)):
                for head in range(h):
                    val = newsc_ref[b, c, head] if pe is None \
                        else sc[head, 0]
                    osc_ref[0, 0, c, head] = jnp.where(
                        hit, val, sctile_ref[0, 0, c, head])
        m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
        s_sc_ref[...] = jnp.zeros_like(s_sc_ref)
        er_sc[...] = jnp.zeros_like(er_sc)
        acc_sc[...] = jnp.zeros_like(acc_sc)

    newest = pos_b
    start = jnp.maximum(newest - (window - 1), 0)
    cdt = jnp.float32 if (not quant and k_ref.dtype == jnp.float32) \
        else jnp.bfloat16

    @pl.when(live)
    def _():
        s_abs = j * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        key_abs = newest - ((newest % seq_len - s_abs) % seq_len)
        ok = (key_abs >= start) & (key_abs <= newest) & (s_abs < seq_len)
        at_row = s_abs == row
        for head in range(h):
            g0, g1 = head * groups, (head + 1) * groups
            qh = q_ref[0, head].astype(jnp.float32)
            if pe is not None:
                if has_qn:
                    qh = _krms(qh, qn_ref[...][0].astype(jnp.float32))
                qh = _pe_apply(qh, pos_b, its_ref[...][0], qscale, pe)
            qh = qh.astype(cdt)
            kh = k_ref[0, 0, 0, head]  # [bs, D] (stale at row)
            vh = v_ref[0, 0, 0, head]
            nk = new_k[head].astype(cdt)
            nv = new_v[head].astype(cdt)
            scores = jax.lax.dot_general(
                qh, kh.astype(cdt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [G, bs]
            # Elementwise f32 mul+sum instead of a [G,D]x[1,D] dot: Mosaic
            # lowers the tiny dot as a fused broadcast+convert that trips
            # its verifier ('vector.broadcast' bf16->f32).  Products are
            # exact (bf16*bf16 in f32); only the sum order differs from
            # the MXU dot (reorder-class drift, same bound as the online
            # softmax itself).
            new_score = jnp.sum(
                qh.astype(jnp.float32) * nk.astype(jnp.float32)[None, :],
                axis=-1, keepdims=True)  # [G, 1]
            if quant:
                nsk = scale_k[head, 0] if pe is not None \
                    else newsc_ref[b, 0, head]
                sck = jnp.where(at_row, nsk,
                                sck_ref[0, 0, 0, head])  # [1, bs]
                scores = jnp.where(at_row, new_score, scores) * sck
            else:
                scores = jnp.where(at_row, new_score, scores)
            if att_cap:
                scores = att_cap * jnp.tanh(scores / att_cap)
            scores = jnp.where(ok, scores, NEG_INF)

            m_old = m_sc[g0:g1, :1]
            bm = jnp.max(scores, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_old, bm)
            safe_m = jnp.where(jnp.isinf(m_new), 0.0, m_new)
            alpha = jnp.where(jnp.isinf(m_old), 0.0,
                              jnp.exp(m_old - safe_m))  # [G, 1]
            e = jnp.exp(scores - safe_m)
            e = jnp.where(ok, e, 0.0)
            er = jnp.sum(jnp.where(at_row, e, 0.0), axis=-1, keepdims=True)
            e_z = jnp.where(at_row, 0.0, e)
            if quant:
                scv = scv_ref[0, 0, 0, head]  # [1, bs] (stale at row: zeroed)
                e_z = e_z * scv
            part = jax.lax.dot_general(
                e_z.astype(cdt), vh.astype(cdt), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [G, D]
            # Full-lane broadcast stores (partial-lane writes relayout).
            lanes = m_sc.shape[-1]
            m_sc[g0:g1, :] = jnp.broadcast_to(m_new, (groups, lanes))
            s_new = (alpha * s_sc_ref[g0:g1, :1]
                     + jnp.sum(e, axis=-1, keepdims=True))
            s_sc_ref[g0:g1, :] = jnp.broadcast_to(s_new, (groups, lanes))
            er_new = alpha * er_sc[g0:g1, :1] + er
            er_sc[g0:g1, :] = jnp.broadcast_to(er_new, (groups, lanes))
            acc_sc[g0:g1, :] = alpha * acc_sc[g0:g1, :] + part

    @pl.when(j == nj - 1)
    def _():
        s_tot = jnp.maximum(s_sc_ref[:, :1], 1e-30)
        out = acc_sc[...] / s_tot
        p_row = er_sc[:, :1] / s_tot  # [h*G, 1]
        for head in range(h):
            g0, g1 = head * groups, (head + 1) * groups
            nv = new_v[head].astype(cdt)
            p = p_row[g0:g1, :]
            if quant:
                nsv = scale_v[head, 0] if pe is not None \
                    else newsc_ref[b, 1, head]
                p = p * nsv
            o_ref[0, g0:g1, :] = out[g0:g1, :] + (
                p.astype(cdt).astype(jnp.float32)
                * nv.reshape(1, -1).astype(jnp.float32))


def _rope_specs(pe, rope_arrays):
    """(in_specs, inputs) for the optional in-kernel rope operands."""
    if pe is None:
        return [], []
    def spec(a):
        shape = (1, a.shape[-1])
        return pl.BlockSpec(shape, lambda *_: (0, 0))
    specs = [spec(a) for a in rope_arrays]
    inputs = [a.reshape(1, -1) for a in rope_arrays]
    return specs, inputs


@functools.partial(
    jax.jit,
    static_argnames=("seq_len", "window", "att_cap", "pe",
                     "qscale", "interpret", "s_block"),
    donate_argnums=0,
)
def _decode_fused_pallas(kv, newkv, q, rows, pos, layer_idx,
                         seq_len: int, window: int, att_cap: float,
                         pe: int | None = None, qscale: float = 1.0,
                         inv_ts=None, knorm=None, qnorm=None,
                         interpret: bool = False,
                         s_block: int | None = None):
    b, n_layers, _, h, s_alloc, d = kv.shape
    groups = q.shape[2]
    w = _sublane(kv.dtype)
    lay = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    rope_arrays = [a for a in (inv_ts, knorm, qnorm) if a is not None]
    rope_specs, rope_inputs = _rope_specs(pe, rope_arrays)

    if s_block is not None:
        assert s_alloc % s_block == 0, (s_alloc, s_block)
        bs = s_block
        nj = s_alloc // bs
        grid = (b, nj)
        sem = ("arbitrary", "arbitrary")

        def jc(j, pos, i):
            # Clamp dead panels to the live frontier: Mosaic skips the
            # DMA when consecutive steps name the same block, so the
            # panel reads scale with ring occupancy, not allocation.
            hi = jnp.minimum(pos[i], seq_len - 1) // bs
            return jnp.minimum(j, hi)

        kernel = functools.partial(
            _decode_fused_sblocked_kernel, h, groups, seq_len, window,
            att_cap, s_alloc, bs, w, False, pe, qscale,
            knorm is not None, qnorm is not None)
        in_specs = [
            pl.BlockSpec((1, h, groups, d),
                         lambda i, j, lay, rows, pos: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2, h, d),
                         lambda i, j, lay, rows, pos: (i, 0, 0, 0)),
        ] + rope_specs + [
            pl.BlockSpec(
                (1, 1, 1, h, bs, d),
                lambda i, j, lay, rows, pos: (i, lay[0], 0, 0,
                                              jc(j, pos, i), 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, h, bs, d),
                lambda i, j, lay, rows, pos: (i, lay[0], 1, 0,
                                              jc(j, pos, i), 0),
            ),
            pl.BlockSpec(
                (1, 1, 2, h, w, d),
                lambda i, j, lay, rows, pos: (i, lay[0], 0, 0,
                                              rows[i] // w, 0),
            ),
        ]
        out_specs = [
            pl.BlockSpec((1, h * groups, d),
                         lambda i, j, lay, rows, pos: (i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 2, h, w, d),
                lambda i, j, lay, rows, pos: (i, lay[0], 0, 0,
                                              rows[i] // w, 0),
            ),
        ]
        scratch = [pltpu.VMEM((h * groups, 128), jnp.float32),
                   pltpu.VMEM((h * groups, 128), jnp.float32),
                   pltpu.VMEM((h * groups, 128), jnp.float32),
                   pltpu.VMEM((h * groups, d), jnp.float32)]
    else:
        grid = (b,)
        sem = ("arbitrary",)
        kernel = functools.partial(
            _decode_fused_kernel, h, groups, seq_len, window, att_cap,
            s_alloc, w, False, pe, qscale, knorm is not None,
            qnorm is not None)
        in_specs = [
            pl.BlockSpec((1, h, groups, d),
                         lambda i, lay, rows, pos: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2, h, d),
                         lambda i, lay, rows, pos: (i, 0, 0, 0)),
        ] + rope_specs + [
            pl.BlockSpec(
                (1, 1, 1, h, s_alloc, d),
                lambda i, lay, rows, pos: (i, lay[0], 0, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, h, s_alloc, d),
                lambda i, lay, rows, pos: (i, lay[0], 1, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, 2, h, w, d),
                lambda i, lay, rows, pos: (i, lay[0], 0, 0,
                                           rows[i] // w, 0),
            ),
        ]
        out_specs = [
            pl.BlockSpec((1, h * groups, d),
                         lambda i, lay, rows, pos: (i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 2, h, w, d),
                lambda i, lay, rows, pos: (i, lay[0], 0, 0,
                                           rows[i] // w, 0),
            ),
        ]
        scratch = []
    o, new_pool = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h * groups, d), jnp.float32),
            jax.ShapeDtypeStruct(kv.shape, kv.dtype),
        ],
        input_output_aliases={7 + len(rope_inputs): 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=sem,
        ),
        interpret=interpret,
    )(lay, rows, pos, q, newkv, *rope_inputs, kv, kv, kv)
    return o, new_pool


@functools.partial(
    jax.jit,
    static_argnames=("seq_len", "window", "att_cap", "pe",
                     "qscale", "interpret", "s_block"),
    donate_argnums=(0, 1),
)
def _decode_fused_q_pallas(kv, sc, newkv, newsc, q, rows, pos,
                           layer_idx, seq_len: int, window: int,
                           att_cap: float, pe: int | None = None,
                           qscale: float = 1.0, inv_ts=None, knorm=None,
                           qnorm=None, interpret: bool = False,
                           s_block: int | None = None):
    b, n_layers, _, h, s_alloc, d = kv.shape
    groups = q.shape[2]
    w = _sublane(kv.dtype)
    s_sc = sc.shape[-1]
    lay = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    rope_arrays = [a for a in (inv_ts, knorm, qnorm) if a is not None]
    rope_specs, rope_inputs = _rope_specs(pe, rope_arrays)
    n_prefetch = 3 if pe is not None else 4
    scalar_inputs = (lay, rows, pos) if pe is not None \
        else (lay, rows, pos, newsc)
    nsp = n_prefetch
    # pf = (lay, rows, pos[, newsc]); pos is pf[2] in BOTH prefetch
    # layouts.

    if s_block is not None:
        assert s_alloc % s_block == 0, (s_alloc, s_block)
        # The scale rows [1, s_sc] share the panel's lane blocking (s_sc
        # == s_alloc for the pools this kernel serves).
        assert s_sc == s_alloc, (s_sc, s_alloc)
        bs = s_block
        nj = s_alloc // bs
        grid = (b, nj)
        sem = ("arbitrary", "arbitrary")

        def jc(j, pos, i):
            hi = jnp.minimum(pos[i], seq_len - 1) // bs
            return jnp.minimum(j, hi)

        kernel = functools.partial(
            _decode_fused_sblocked_kernel, h, groups, seq_len, window,
            att_cap, s_alloc, bs, w, True, pe, qscale,
            knorm is not None, qnorm is not None)
        in_specs = [
            pl.BlockSpec((1, h, groups, d),
                         lambda i, j, *pf: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2, h, d),
                         lambda i, j, *pf: (i, 0, 0, 0)),
        ] + rope_specs + [
            pl.BlockSpec(
                (1, 1, 1, h, bs, d),
                lambda i, j, *pf: (i, pf[0][0], 0, 0,
                                   jc(j, pf[2], i), 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, h, bs, d),
                lambda i, j, *pf: (i, pf[0][0], 1, 0,
                                   jc(j, pf[2], i), 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, h, 1, bs),
                lambda i, j, *pf: (i, pf[0][0], 0, 0, 0,
                                   jc(j, pf[2], i)),
            ),
            pl.BlockSpec(
                (1, 1, 1, h, 1, bs),
                lambda i, j, *pf: (i, pf[0][0], 1, 0, 0,
                                   jc(j, pf[2], i)),
            ),
            pl.BlockSpec(
                (1, 1, 2, h, w, d),
                lambda i, j, *pf: (i, pf[0][0], 0, 0, pf[1][i] // w, 0),
            ),
            pl.BlockSpec(
                (1, 1, 2, h, 1, s_sc),
                lambda i, j, *pf: (i, pf[0][0], 0, 0, 0, 0),
            ),
        ]
        out_specs = [
            pl.BlockSpec((1, h * groups, d), lambda i, j, *pf: (i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 2, h, w, d),
                lambda i, j, *pf: (i, pf[0][0], 0, 0, pf[1][i] // w, 0),
            ),
            pl.BlockSpec(
                (1, 1, 2, h, 1, s_sc),
                lambda i, j, *pf: (i, pf[0][0], 0, 0, 0, 0),
            ),
        ]
        scratch = [pltpu.VMEM((h * groups, 128), jnp.float32),
                   pltpu.VMEM((h * groups, 128), jnp.float32),
                   pltpu.VMEM((h * groups, 128), jnp.float32),
                   pltpu.VMEM((h * groups, d), jnp.float32)]
    else:
        grid = (b,)
        sem = ("arbitrary",)
        kernel = functools.partial(
            _decode_fused_kernel, h, groups, seq_len, window, att_cap,
            s_alloc, w, True, pe, qscale, knorm is not None,
            qnorm is not None)
        in_specs = [
            pl.BlockSpec((1, h, groups, d),
                         lambda i, *pf: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2, h, d),
                         lambda i, *pf: (i, 0, 0, 0)),
        ] + rope_specs + [
            pl.BlockSpec(
                (1, 1, 1, h, s_alloc, d),
                lambda i, *pf: (i, pf[0][0], 0, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, h, s_alloc, d),
                lambda i, *pf: (i, pf[0][0], 1, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, h, 1, s_sc),
                lambda i, *pf: (i, pf[0][0], 0, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, h, 1, s_sc),
                lambda i, *pf: (i, pf[0][0], 1, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, 2, h, w, d),
                lambda i, *pf: (i, pf[0][0], 0, 0, pf[1][i] // w, 0),
            ),
            pl.BlockSpec(
                (1, 1, 2, h, 1, s_sc),
                lambda i, *pf: (i, pf[0][0], 0, 0, 0, 0),
            ),
        ]
        out_specs = [
            pl.BlockSpec((1, h * groups, d), lambda i, *pf: (i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 2, h, w, d),
                lambda i, *pf: (i, pf[0][0], 0, 0, pf[1][i] // w, 0),
            ),
            pl.BlockSpec(
                (1, 1, 2, h, 1, s_sc),
                lambda i, *pf: (i, pf[0][0], 0, 0, 0, 0),
            ),
        ]
        scratch = []

    o, new_pool, new_sc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h * groups, d), jnp.float32),
            jax.ShapeDtypeStruct(kv.shape, kv.dtype),
            jax.ShapeDtypeStruct(sc.shape, sc.dtype),
        ],
        input_output_aliases={
            nsp + 2 + len(rope_inputs) + 4: 1,
            nsp + 2 + len(rope_inputs) + 5: 2,
        },
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=sem,
        ),
        interpret=interpret,
    )(*scalar_inputs, q, newkv, *rope_inputs, kv, kv, sc, sc, kv, sc)
    return o, new_pool, new_sc


@functools.partial(
    jax.jit,
    static_argnames=("heads", "seq_len", "window", "att_cap", "pe",
                     "qscale", "interpret"),
    donate_argnums=0,
)
def _decode_fused_packed_pallas(kv, qkv, rows, pos, layer_idx, heads: int,
                                seq_len: int, window: int, att_cap: float,
                                pe: int, qscale: float = 1.0,
                                inv_ts=None, knorm=None, qnorm=None,
                                interpret: bool = False):
    b, n_layers, _, h, s_alloc, d = kv.shape
    groups = heads // h
    w = _sublane(kv.dtype)
    lay = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    rope_arrays = [a for a in (inv_ts, knorm, qnorm) if a is not None]
    rope_specs, rope_inputs = _rope_specs(pe, rope_arrays)
    nlanes = qkv.shape[1]

    kernel = functools.partial(
        _decode_fused_packed_kernel, heads, h, groups, seq_len, window,
        att_cap, s_alloc, w, False, pe, qscale, knorm is not None,
        qnorm is not None)
    in_specs = [
        pl.BlockSpec((1, nlanes), lambda i, *pf: (i, 0)),
    ] + rope_specs + [
        pl.BlockSpec((1, 1, 1, h, s_alloc, d),
                     lambda i, *pf: (i, pf[0][0], 0, 0, 0, 0)),
        pl.BlockSpec((1, 1, 1, h, s_alloc, d),
                     lambda i, *pf: (i, pf[0][0], 1, 0, 0, 0)),
        pl.BlockSpec((1, 1, 2, h, w, d),
                     lambda i, *pf: (i, pf[0][0], 0, 0, pf[1][i] // w, 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, heads * d), lambda i, *pf: (i, 0)),
        pl.BlockSpec((1, 1, 2, h, w, d),
                     lambda i, *pf: (i, pf[0][0], 0, 0, pf[1][i] // w, 0)),
    ]
    o, new_pool = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, heads * d), jnp.bfloat16),
            jax.ShapeDtypeStruct(kv.shape, kv.dtype),
        ],
        input_output_aliases={6 + len(rope_inputs): 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lay, rows, pos, qkv, *rope_inputs, kv, kv, kv)
    return o, new_pool


@functools.partial(
    jax.jit,
    static_argnames=("heads", "seq_len", "window", "att_cap", "pe",
                     "qscale", "interpret"),
    donate_argnums=(0, 1),
)
def _decode_fused_packed_q_pallas(kv, sc, qkv, rows, pos, layer_idx,
                                  heads: int, seq_len: int, window: int,
                                  att_cap: float, pe: int,
                                  qscale: float = 1.0, inv_ts=None,
                                  knorm=None, qnorm=None,
                                  interpret: bool = False):
    b, n_layers, _, h, s_alloc, d = kv.shape
    groups = heads // h
    w = _sublane(kv.dtype)
    s_sc = sc.shape[-1]
    lay = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    rope_arrays = [a for a in (inv_ts, knorm, qnorm) if a is not None]
    rope_specs, rope_inputs = _rope_specs(pe, rope_arrays)
    nlanes = qkv.shape[1]

    kernel = functools.partial(
        _decode_fused_packed_kernel, heads, h, groups, seq_len, window,
        att_cap, s_alloc, w, True, pe, qscale, knorm is not None,
        qnorm is not None)
    in_specs = [
        pl.BlockSpec((1, nlanes), lambda i, *pf: (i, 0)),
    ] + rope_specs + [
        pl.BlockSpec((1, 1, 1, h, s_alloc, d),
                     lambda i, *pf: (i, pf[0][0], 0, 0, 0, 0)),
        pl.BlockSpec((1, 1, 1, h, s_alloc, d),
                     lambda i, *pf: (i, pf[0][0], 1, 0, 0, 0)),
        pl.BlockSpec((1, 1, 1, h, 1, s_sc),
                     lambda i, *pf: (i, pf[0][0], 0, 0, 0, 0)),
        pl.BlockSpec((1, 1, 1, h, 1, s_sc),
                     lambda i, *pf: (i, pf[0][0], 1, 0, 0, 0)),
        pl.BlockSpec((1, 1, 2, h, w, d),
                     lambda i, *pf: (i, pf[0][0], 0, 0, pf[1][i] // w, 0)),
        pl.BlockSpec((1, 1, 2, h, 1, s_sc),
                     lambda i, *pf: (i, pf[0][0], 0, 0, 0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, heads * d), lambda i, *pf: (i, 0)),
        pl.BlockSpec((1, 1, 2, h, w, d),
                     lambda i, *pf: (i, pf[0][0], 0, 0, pf[1][i] // w, 0)),
        pl.BlockSpec((1, 1, 2, h, 1, s_sc),
                     lambda i, *pf: (i, pf[0][0], 0, 0, 0, 0)),
    ]
    o, new_pool, new_sc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, heads * d), jnp.bfloat16),
            jax.ShapeDtypeStruct(kv.shape, kv.dtype),
            jax.ShapeDtypeStruct(sc.shape, sc.dtype),
        ],
        input_output_aliases={
            8 + len(rope_inputs): 1,
            9 + len(rope_inputs): 2,
        },
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lay, rows, pos, qkv, *rope_inputs, kv, kv, sc, sc, kv, sc)
    return o, new_pool, new_sc


_PACKED_PROBED: dict = {}


def _probe_packed_compile(cache, layer_idx: int, qkv_shape, heads: int,
                          rope, window: int, att_cap: float) -> bool:
    """One-time AOT compile check of the packed fused kernel (same
    pattern as _probe_fused_compile: an in-jit Mosaic failure would sink
    the enclosing executable with no fallback)."""
    pool, idx, ring = cache.pool(layer_idx)
    d = pool.shape[-1]
    window = int(window)
    att_cap = float(att_cap)
    key = (cache.quantized, pool.shape, str(pool.dtype), tuple(qkv_shape),
           heads, ring, window, att_cap, rope.post_qk, rope.query_scale,
           rope.key_norm is not None, rope.query_norm is not None)
    hit = _PACKED_PROBED.get(key)
    if hit is not None:
        return hit
    try:
        b = qkv_shape[0]
        qkv = jax.ShapeDtypeStruct(tuple(qkv_shape), jnp.float32)
        rows = jax.ShapeDtypeStruct((b,), jnp.int32)
        pos = jax.ShapeDtypeStruct((b,), jnp.int32)
        rkw = {"inv_ts": jax.ShapeDtypeStruct(
            (rope.inv_timescale.shape[-1],), jnp.float32)}
        if rope.key_norm is not None:
            rkw["knorm"] = jax.ShapeDtypeStruct((d,), jnp.float32)
        if rope.query_norm is not None:
            rkw["qnorm"] = jax.ShapeDtypeStruct((d,), jnp.float32)
        lidx = jax.ShapeDtypeStruct((), jnp.int32)
        if cache.quantized:
            sc = cache.pool_scale(layer_idx)
            _decode_fused_packed_q_pallas.lower(
                _sds(pool), _sds(sc), qkv, rows, pos, lidx, heads, ring,
                window, att_cap, pe=rope.post_qk,
                qscale=rope.query_scale, interpret=False, **rkw).compile()
        else:
            _decode_fused_packed_pallas.lower(
                _sds(pool), qkv, rows, pos, lidx, heads, ring, window,
                att_cap, pe=rope.post_qk, qscale=rope.query_scale,
                interpret=False, **rkw).compile()
        ok = True
    except Exception:  # noqa: BLE001 — any compile failure means fallback
        ok = False
    _PACKED_PROBED[key] = ok
    return ok


def decode_attention_write_packed(cache, layer_idx: int, qkv_all,
                                  positions, window: int, heads: int,
                                  att_cap: float = 0.0, valid=None,
                                  rope: RopeSpec | None = None,
                                  use_pallas: bool | None = None,
                                  interpret: bool = False):
    """decode_attention_write consuming the qkv GEMM's output directly.

    qkv_all: [B, (heads + 2*kv_heads)*D] f32 — the fused qkv_cat GEMM
    row, with gemma.py's column order (q heads kv-major, then per-kv-head
    interleaved K/V).  Returns (att_out [B, heads*D] bf16, cache) — the
    att_w GEMM's native A layout.  Eliminates the q/kv slice-reshape-
    stack and att-out reshape-cast XLA fusions of the unpacked path
    (~2 launch-bound kernels/layer, docs/PERF.md round-5 #6).  rope is
    REQUIRED (the decode hot path always position-encodes in-kernel).
    Falls back to the host-side slicing + decode_attention_write pair
    off-TPU, for lane-unaligned heads, past the VMEM panel budget, or
    when GEMMA_PACKED_DECODE=0 / GEMMA_FUSED_DECODE=0 (hardware A/B
    escape hatches)."""
    import os

    assert rope is not None, "packed decode requires in-kernel rope"
    pool, idx, ring = cache.pool(layer_idx)
    kv_heads, d = pool.shape[3], pool.shape[5]
    b = qkv_all.shape[0]
    if use_pallas is None:
        use_pallas = _use_pallas() and d % 128 == 0 \
            and os.environ.get("GEMMA_FUSED_DECODE", "1") != "0" \
            and os.environ.get("GEMMA_PACKED_DECODE", "1") != "0" \
            and os.environ.get("GEMMA_SBLOCK_DECODE", "0") != "1"
    if use_pallas:
        itemsize = jnp.dtype(pool.dtype).itemsize
        panel = kv_heads * pool.shape[4] * d * 2 * itemsize * 2
        if panel > _PANEL_VMEM_BUDGET:
            use_pallas = False
    if use_pallas and not interpret and _use_pallas():
        use_pallas = _probe_packed_compile(cache, layer_idx, qkv_all.shape,
                                           heads, rope, window, att_cap)
    if not use_pallas:
        # The glue this kernel exists to remove — paid only on fallback
        # paths (CPU tests, S-blocked opt-in, unaligned configs).
        q = qkv_all[:, : heads * d].reshape(b, 1, heads, d)
        kvp = qkv_all[:, heads * d:].reshape(b, 1, kv_heads, 2, d)
        k, v = kvp[..., 0, :], kvp[..., 1, :]
        out, cache = decode_attention_write(
            cache, layer_idx, q, positions, k, v, window, att_cap=att_cap,
            valid=valid, rope=rope, interpret=interpret)
        return out.reshape(b, heads * d).astype(jnp.bfloat16), cache

    rows = (positions[:, 0] % ring).astype(jnp.int32)
    if valid is not None:
        rows = jnp.where(valid[:, 0], rows, ring)
    pos = positions[:, 0].astype(jnp.int32)
    rkw = dict(
        inv_ts=rope.inv_timescale.astype(jnp.float32),
        knorm=None if rope.key_norm is None
        else rope.key_norm.astype(jnp.float32),
        qnorm=None if rope.query_norm is None
        else rope.query_norm.astype(jnp.float32),
    )
    if cache.quantized:
        o, new_pool, new_sc = _decode_fused_packed_q_pallas(
            pool, cache.pool_scale(layer_idx), qkv_all, rows, pos, idx,
            heads, ring, window, float(att_cap), pe=rope.post_qk,
            qscale=rope.query_scale, interpret=interpret, **rkw)
        cache = cache._replace_pool(layer_idx, new_pool, new_sc)
    else:
        o, new_pool = _decode_fused_packed_pallas(
            pool, qkv_all, rows, pos, idx, heads, ring, window,
            float(att_cap), pe=rope.post_qk, qscale=rope.query_scale,
            interpret=interpret, **rkw)
        cache = cache._replace_pool(layer_idx, new_pool)
    return o, cache


class RopeSpec:
    """Static + array bundle for in-kernel position encoding.

    post_qk: PostQKType int; query_scale folded into q's rotation;
    key_norm/query_norm: optional (1+w) RMSNorm weights [D] applied
    before RoPE (Gemma3, attention.cc:142-151, 288-320)."""

    def __init__(self, inv_timescale, post_qk: int, query_scale: float,
                 key_norm=None, query_norm=None):
        self.inv_timescale = inv_timescale
        self.post_qk = int(post_qk)
        self.query_scale = float(query_scale)
        self.key_norm = key_norm
        self.query_norm = query_norm

    def apply_host(self, q, k):
        """The composed-ops equivalent (fallback paths)."""
        from gemma_tpu.ops import ops as _ops

        pe = _ops.half_rope if self.post_qk == 1 else _ops.rope
        if self.key_norm is not None:
            k = _ops.rms_norm(k, self.key_norm)
        if self.query_norm is not None:
            q = _ops.rms_norm(q, self.query_norm)
        # positions enter via the caller (broadcast per [B, T] row).
        return q, k, pe


_FUSED_PROBED: dict = {}


def _probe_fused_compile(cache, layer_idx: int, q, rope,
                         window: int, att_cap: float,
                         s_block: int | None = None) -> bool:
    """One-time AOT compile check of the fused write+attend kernel for
    this (pool, q, rope, window, att_cap) signature; False -> composed
    fallback.  window/att_cap are static kernel parameters (they change
    the traced masking/softcap program), so the probe must lower the
    exact variant the decode step will trace."""
    pool, idx, ring = cache.pool(layer_idx)
    b, t, heads, d = q.shape
    kv_heads = pool.shape[3]
    pe = None if rope is None else rope.post_qk
    qscale = 1.0 if rope is None else rope.query_scale
    window = int(window)
    att_cap = float(att_cap)
    key = (cache.quantized, pool.shape, str(pool.dtype), q.shape, ring,
           window, att_cap, pe, qscale,
           rope is not None and rope.key_norm is not None,
           rope is not None and rope.query_norm is not None, s_block)
    hit = _FUSED_PROBED.get(key)
    if hit is not None:
        return hit
    try:
        qk = jax.ShapeDtypeStruct((b, kv_heads, heads // kv_heads, d),
                                  jnp.float32)
        rows = jax.ShapeDtypeStruct((b,), jnp.int32)
        pos = jax.ShapeDtypeStruct((b,), jnp.int32)
        rkw = {}
        if rope is not None:
            rkw["inv_ts"] = jax.ShapeDtypeStruct(
                (rope.inv_timescale.shape[-1],), jnp.float32)
            if rope.key_norm is not None:
                rkw["knorm"] = jax.ShapeDtypeStruct((d,), jnp.float32)
            if rope.query_norm is not None:
                rkw["qnorm"] = jax.ShapeDtypeStruct((d,), jnp.float32)
        if cache.quantized:
            sc = cache.pool_scale(layer_idx)
            newkv = jax.ShapeDtypeStruct(
                (b, 2, kv_heads, d),
                jnp.float32 if rope is not None else jnp.int8)
            newsc = jax.ShapeDtypeStruct((b, 2, kv_heads), jnp.float32)
            _decode_fused_q_pallas.lower(
                _sds(pool), _sds(sc), newkv, newsc, qk, rows, pos,
                jax.ShapeDtypeStruct((), jnp.int32), ring, window,
                att_cap, pe=pe, qscale=qscale,
                interpret=False, s_block=s_block, **rkw).compile()
        else:
            newkv = jax.ShapeDtypeStruct(
                (b, 2, kv_heads, d),
                jnp.float32 if rope is not None else pool.dtype)
            _decode_fused_pallas.lower(
                _sds(pool), newkv, qk, rows, pos,
                jax.ShapeDtypeStruct((), jnp.int32), ring, window,
                att_cap, pe=pe, qscale=qscale, interpret=False,
                s_block=s_block, **rkw).compile()
        ok = True
    except Exception:  # noqa: BLE001 — any compile failure means fallback
        ok = False
    _FUSED_PROBED[key] = ok
    return ok


def decode_attention_write(cache, layer_idx: int, q, positions, k, v,
                           window: int, att_cap: float = 0.0, valid=None,
                           rope: RopeSpec | None = None,
                           use_pallas: bool | None = None,
                           interpret: bool = False):
    """KV row write + single-token attention in ONE kernel.

    q: [B, 1, heads, D]; k, v: [B, 1, H, D]; positions: [B, 1].  With
    `rope`, q and k arrive RAW and the QK norms + RoPE (+ i8 row
    quantization) run inside the kernel too; otherwise they must be
    pre-encoded.  Returns (att_out [B, 1, heads, D] f32, cache).
    Falls back to the composed kv_write_decode + decode_attention pair
    off-TPU, for lane-unaligned heads, past the VMEM panel budget (where
    attention routes through the S-blocked flash kernel), and when
    GEMMA_FUSED_DECODE=0 (hardware A/B escape hatch: the fused kernel
    passes the pool as several aliased operand views, which interpret
    mode cannot performance-validate)."""
    import os

    pool, idx, ring = cache.pool(layer_idx)
    if use_pallas is None:
        use_pallas = _use_pallas() and q.shape[-1] % 128 == 0 \
            and pool.shape[-1] % 128 == 0 \
            and os.environ.get("GEMMA_FUSED_DECODE", "1") != "0"
    # S-blocked panels with live-frontier index clamping: HBM reads scale
    # with ring occupancy instead of allocation (2x saving at a half-full
    # ring).  GEMMA_SBLOCK_DECODE=1 opts in (hardware A/B; output drifts
    # from the one-shot kernel only by online-softmax rounding order).
    s_block = None
    if use_pallas and os.environ.get("GEMMA_SBLOCK_DECODE", "0") == "1":
        row_bytes = (pool.shape[3] * pool.shape[5]
                     * jnp.dtype(pool.dtype).itemsize)
        s_block = pick_s_block(
            pool.shape[4], _sublane(pool.dtype), row_bytes,
            lane_multiple=128 if cache.quantized else None)
    if use_pallas and not interpret and _use_pallas():
        # The in-jit call cannot catch a Mosaic compile error (it would
        # fail the ENCLOSING executable with no fallback) — AOT-probe the
        # fused kernel once per signature; failures route to the
        # hardware-proven composed pair (same pattern as
        # ops/matmul.py:_probe_gated_compile).
        use_pallas = _probe_fused_compile(cache, layer_idx, q, rope,
                                          window, att_cap,
                                          s_block=s_block)
        if not use_pallas and s_block is not None:
            # The blocked variant may fail where the one-shot compiles.
            s_block = None
            use_pallas = _probe_fused_compile(cache, layer_idx, q, rope,
                                              window, att_cap)
    if use_pallas:
        _, _, _, kvh_, s_alloc_, d_ = pool.shape
        itemsize = jnp.dtype(pool.dtype).itemsize
        # S-blocked panels only hold bs rows in VMEM, so the blocked
        # variant keeps the fused path alive far past the one-shot
        # panel budget (where attention otherwise exits to flash).
        span = s_block if s_block is not None else s_alloc_
        panel = kvh_ * span * d_ * 2 * itemsize * 2
        if panel > _PANEL_VMEM_BUDGET:
            use_pallas = False
    if not use_pallas:
        if rope is not None:
            q, k, pe = rope.apply_host(q, k)
            k = pe(k, positions[..., None], rope.inv_timescale, 1.0)
            q = pe(q, positions[..., None], rope.inv_timescale,
                   rope.query_scale)
        cache = kv_write_decode(cache, layer_idx, positions, k, v,
                                valid=valid)
        out = decode_attention(cache, layer_idx, q, positions, window,
                               att_cap=att_cap)
        return out, cache

    b, t, heads, d = q.shape
    assert t == 1
    kv_heads = pool.shape[3]
    groups = heads // kv_heads
    rows = (positions[:, 0] % ring).astype(jnp.int32)
    if valid is not None:
        rows = jnp.where(valid[:, 0], rows, ring)
    pos = positions[:, 0].astype(jnp.int32)
    newkv = jnp.stack([k[:, 0], v[:, 0]], axis=1)  # [B, 2, H, D]
    qk = q.reshape(b, kv_heads, groups, d)
    pe = None if rope is None else rope.post_qk
    qscale = 1.0 if rope is None else rope.query_scale
    rkw = {} if rope is None else dict(
        inv_ts=rope.inv_timescale.astype(jnp.float32),
        knorm=None if rope.key_norm is None
        else rope.key_norm.astype(jnp.float32),
        qnorm=None if rope.query_norm is None
        else rope.query_norm.astype(jnp.float32),
    )
    if cache.quantized:
        if rope is None:
            from gemma_tpu.ops.kv_quant import quantize_rows

            codes, scale = quantize_rows(newkv)
        else:
            codes, scale = newkv, jnp.zeros((b, 2, kv_heads), jnp.float32)
        out, new_pool, new_sc = _decode_fused_q_pallas(
            pool, cache.pool_scale(layer_idx), codes, scale, qk, rows,
            pos, idx, ring, window, float(att_cap), pe=pe, qscale=qscale,
            interpret=interpret, s_block=s_block, **rkw)
        cache = cache._replace_pool(layer_idx, new_pool, new_sc)
    else:
        nk = newkv if rope is not None else newkv.astype(pool.dtype)
        out, new_pool = _decode_fused_pallas(
            pool, nk, qk, rows, pos, idx, ring, window, float(att_cap),
            pe=pe, qscale=qscale, interpret=interpret, s_block=s_block,
            **rkw)
        cache = cache._replace_pool(layer_idx, new_pool)
    return out.reshape(b, 1, heads, d), cache


# Whole-[H, S, D] K/V panels (x2 for double buffering) must fit VMEM; past
# this the flash kernel's S-blocked online softmax takes over (slower per
# step at short S, but the only option at long context).
_PANEL_VMEM_BUDGET = 12 << 20


def decode_attention(cache, layer_idx: int, q, positions, window: int,
                     att_cap: float = 0.0,
                     use_pallas: bool | None = None) -> jnp.ndarray:
    """Single-token attention over the ring cache.

    q: [B, 1, heads, D] (RoPE'd and scaled); positions: [B, 1].
    Returns [B, 1, heads, D] f32.
    """
    pool, idx, ring = cache.pool(layer_idx)
    if use_pallas is None:
        # Mosaic needs lane-aligned head dims; tiny test configs fall back.
        use_pallas = _use_pallas() and q.shape[-1] % 128 == 0
    if use_pallas:
        _, _, _, kvh_, s_alloc_, d_ = pool.shape
        itemsize = jnp.dtype(pool.dtype).itemsize
        panel = kvh_ * s_alloc_ * d_ * 2 * itemsize * 2  # K+V, dbl-buffer
        if panel > _PANEL_VMEM_BUDGET:
            from gemma_tpu.ops.flash_attention import flash_prefill_attention

            return flash_prefill_attention(
                cache, layer_idx, q, positions, window, att_cap=att_cap,
                use_pallas=True)
    b, t, heads, d = q.shape
    assert t == 1, "decode_attention is the T == 1 path"
    kv_heads = pool.shape[3]
    groups = heads // kv_heads

    if not use_pallas:
        from gemma_tpu.ops.attention import attention_mask, dot_softmax_weighted_sum

        s_alloc = pool.shape[4]
        mask = attention_mask(positions, ring, window, 0)
        mask = jnp.concatenate(
            [mask, jnp.zeros((b, t, s_alloc - ring), bool)], axis=-1)
        if cache.quantized:
            from gemma_tpu.ops.attention import dot_softmax_weighted_sum_q

            sc = cache.pool_scale(layer_idx)
            return dot_softmax_weighted_sum_q(
                q, pool[:, idx, 0], pool[:, idx, 1],
                sc[:, idx, 0, :, 0], sc[:, idx, 1, :, 0], mask,
                att_cap=att_cap)
        return dot_softmax_weighted_sum(
            q, cache.k_layer(layer_idx), cache.v_layer(layer_idx), mask,
            att_cap=att_cap)

    qk = q.reshape(b, kv_heads, groups, d)
    if cache.quantized:
        out = _decode_att_q_pallas(
            pool, cache.pool_scale(layer_idx), qk,
            positions[:, 0].astype(jnp.int32), idx, ring, window,
            float(att_cap))
    else:
        out = _decode_att_pallas(
            pool, qk, positions[:, 0].astype(jnp.int32), idx,
            ring, window, float(att_cap))
    return out.reshape(b, 1, heads, d)
