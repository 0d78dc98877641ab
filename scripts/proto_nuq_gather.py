"""Prototype: nuq4 GEMM with tpu.dynamic_gather LUT dequant (VERDICT r1 #2).

Compares, on the real TPU with the scan-loop methodology (CLAUDE.md):
  tree : current select-tree kernel (ops/matmul.py nuq4 path)
  gathA: 128-lane dynamic_gather dequant, per-chunk K=128 dots
  gathB: gather dequant into a bf16 scratch, one full-bk dot per k-step
  gathC: like A but bf16 tables (gather on 16-bit operand), if it lowers

Usage: python scripts/proto_nuq_gather.py [--m 16] [--reps 100]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gemma_tpu.utils.basics import round_up


def gather_kernel(variant: str, n_k_steps: int, bk: int, *refs):
    a_ref, b_ref, tbl_ref, out_ref, acc_ref, *scr = refs
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    n_chunks = bk // 128
    if variant == "B":
        deq_ref = scr[0]
    for chunk in range(n_chunks):
        g = chunk // 2
        sub = g // 8
        tbl = tbl_ref[:, sub * 128 : (sub + 1) * 128]
        idx = (b_ref[:, chunk * 128 : (chunk + 1) * 128].astype(jnp.int32)
               + 16 * (g % 8))
        deq = jnp.take_along_axis(tbl, idx, axis=1)
        if variant == "B":
            deq_ref[:, chunk * 128 : (chunk + 1) * 128] = deq.astype(
                jnp.bfloat16)
        else:
            acc_ref[...] += jax.lax.dot_general(
                a_ref[:, chunk * 128 : (chunk + 1) * 128],
                deq.astype(a_ref.dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if variant == "B":
        acc_ref[...] += jax.lax.dot_general(
            a_ref[...], deq_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k_step == n_k_steps - 1)
    def _():
        out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("variant", "bm", "bn", "bk"))
def mm_gather(a, codes, tables_p, variant, bm, bn, bk):
    m, k = a.shape
    n = codes.shape[0]
    mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
    grid = (mp // bm, np_ // bn, kp // bk)
    gk = bk // 256
    tl = round_up(gk * 16, 128)

    scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
    if variant == "B":
        scratch.append(pltpu.VMEM((bn, bk), jnp.bfloat16))
    kernel = functools.partial(gather_kernel, variant, grid[2], bk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk)),
            pl.BlockSpec((bn, tl), lambda i, j, kk: (j, kk)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=int(mp * kp * 2 + np_ * kp * 0.5625 + mp * np_ * 4),
            transcendentals=0,
        ),
    )(a, codes, tables_p)
    return out[:m, :n]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--k", type=int, default=2304)
    p.add_argument("--n", type=int, default=9216)
    p.add_argument("--reps", type=int, default=100)
    args = p.parse_args()
    m, k, n = args.m, args.k, args.n

    from gemma_tpu.ops.autotune import _dispatch_overhead
    from gemma_tpu.ops.matmul import matmul
    from gemma_tpu.utils.synth import synth_quant

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = synth_quant(rng, n, k, "nuq4")
    codes = w.arrays["codes"]
    tables = np.asarray(w.arrays["tables"])  # [n, k/256, 16]
    overhead = _dispatch_overhead()

    # Reference output via the existing tree kernel.
    ref = np.asarray(matmul(a, w))

    def bench(fn, *xs):
        @jax.jit
        def loop(a, *xs):
            def body(c, _):
                out = fn(c, *xs)
                return c + (out[0, 0] * 1e-30).astype(c.dtype), ()
            f, _ = jax.lax.scan(body, a, None, length=args.reps)
            return f[0, 0]
        float(loop(a, *xs))
        t0 = time.perf_counter()
        float(loop(a, *xs))
        return max(time.perf_counter() - t0 - overhead, 1e-9) / args.reps

    bytes_eff = 0.5625 * k * n

    t = bench(lambda c: matmul(c, w))
    print(f"tree : {t*1e6:8.1f}us  {bytes_eff/t/1e9:7.1f} GB/s-eff")

    for bk in (768, 2304):
        gk = bk // 256
        tl = round_up(gk * 16, 128)
        tables_p = np.zeros((n, tl), np.float32)
        tables_p[:, : gk * 16] = 0  # filled per k-step? NO — per j-block
        # tables blocked along K: pad flattened [n, kp/256*16] per k-step
        # layout: steps of gk*16 -> must lay out per k-step contiguously.
        kp = round_up(k, bk)
        steps = kp // bk
        tp = np.zeros((n, steps * tl), np.float32)
        flat = tables.reshape(n, -1)  # [n, gtot*16]
        for s in range(steps):
            lo, hi = s * gk * 16, min((s + 1) * gk * 16, flat.shape[1])
            tp[:, s * tl : s * tl + (hi - lo)] = flat[:, lo:hi]
        tp = jnp.asarray(tp)

        for variant in ("A", "B"):
            try:
                got = np.asarray(mm_gather(a, codes, tp, variant, 16,
                                           min(512, n), bk))
                ok = np.array_equal(got, ref)
                t = bench(lambda c, tp=tp, v=variant, bk=bk: mm_gather(
                    c, codes, tp, v, 16, min(512, n), bk))
                print(f"gath{variant} bk={bk:5d}: {t*1e6:8.1f}us  "
                      f"{bytes_eff/t/1e9:7.1f} GB/s-eff  exact={ok}")
            except Exception as e:
                print(f"gath{variant} bk={bk}: FAILED "
                      + str(e)[:200].replace("\n", " "))


if __name__ == "__main__":
    main()
