"""Diagnostic: cost breakdown of the nuq4 gather GEMM (VERDICT r1 #2).

Variants (M=16, K=2304, N=9216, full-K tiles, bn=512):
  D1: codes u8 -> bf16 astype -> dot            (astype8->16 + dot floor)
  D2: codes u8 -> i32 -> bf16 -> dot            (adds the 8->32 unpack)
  D3: codes u8 -> i32 -> gather f32 -> bf16 dot (adds the gather; = gathA
      minus the +offset add, codes pre-offset on host)
"""

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


def kern(variant, n_k_steps, bk, a_ref, b_ref, tbl_ref, out_ref, acc_ref):
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def dot(a_t, b_t):
        acc_ref[...] += jax.lax.dot_general(
            a_t, b_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    if variant == "D1":
        dot(a_ref[...], b_ref[...].astype(jnp.int8).astype(jnp.bfloat16))
    elif variant == "D2":
        c = b_ref[...].astype(jnp.int32)
        dot(a_ref[...], c.astype(jnp.bfloat16))
    elif variant == "D3":
        for chunk in range(bk // 128):
            sub = chunk // 16
            tbl = tbl_ref[:, sub * 128 : (sub + 1) * 128]
            idx = b_ref[:, chunk * 128 : (chunk + 1) * 128].astype(jnp.int32)
            deq = jnp.take_along_axis(tbl, idx, axis=1)
            dot(a_ref[:, chunk * 128 : (chunk + 1) * 128],
                deq.astype(jnp.bfloat16))

    @pl.when(k_step == n_k_steps - 1)
    def _():
        out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("variant", "bm", "bn", "bk"))
def run(a, codes, tables_p, variant, bm, bn, bk):
    m, k = a.shape
    n = codes.shape[0]
    mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
    grid = (mp // bm, np_ // bn, kp // bk)
    tl = tables_p.shape[1]
    out = pl.pallas_call(
        functools.partial(kern, variant, grid[2], bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk)),
            pl.BlockSpec((bn, tl), lambda i, j, kk: (j, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=int(mp * kp * 2 + np_ * kp + mp * np_ * 4),
            transcendentals=0,
        ),
    )(a, codes, tables_p)
    return out[:m, :n]


def main():
    m, k, n = 16, 2304, 9216
    reps = 100
    from gemma_tpu.ops.autotune import _dispatch_overhead

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    # Pre-offset codes: idx = code + 16*(g%8), g = column//256.
    codes4 = rng.integers(0, 16, (n, k)).astype(np.uint8)
    offs = (16 * ((np.arange(k) // 256) % 8)).astype(np.uint8)
    codes = jnp.asarray(codes4 + offs[None, :])
    gk = k // 256
    tl = round_up(gk * 16, 128)
    tables_p = jnp.asarray(rng.random((n, tl)).astype(np.float32))
    overhead = _dispatch_overhead()

    def bench(variant, bk):
        @jax.jit
        def loop(a):
            def body(c, _):
                out = run(c, codes, tables_p, variant, 16, 512, bk)
                return c + (out[0, 0] * 1e-30).astype(c.dtype), ()
            f, _ = jax.lax.scan(body, a, None, length=reps)
            return f[0, 0]
        float(loop(a))
        t0 = time.perf_counter()
        float(loop(a))
        return max(time.perf_counter() - t0 - overhead, 1e-9) / reps

    for variant in ("D1", "D2", "D3"):
        t = bench(variant, 2304)
        print(f"{variant}: {t*1e6:8.1f}us  "
              f"({0.5625*k*n/t/1e9:6.1f} GB/s-eff-if-nuq4)")


if __name__ == "__main__":
    main()
