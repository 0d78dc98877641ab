"""Standalone GEMM benchmark: per shape/codec times, GFLOP/s and effective
GB/s (maps ops/bench_matmul.cc:50-179).

    python scripts/bench_matmul.py [--kinds sfp,bf16,i8,nuq4]
        [--shapes 16x2304x9216,256x2304x9216] [--reps 200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_SHAPES = [  # Gemma2-2B decode/prefill shapes (vocab 256000)
    (16, 2304, 2048), (16, 2304, 9216), (16, 9216, 2304),
    (16, 2304, 256000),
    (256, 2304, 9216), (256, 9216, 2304),
]

from gemma_tpu.ops.matmul import PACKED_BYTES as BYTES  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--kinds", default="sfp,bf16,i8,nuq4")
    p.add_argument("--shapes", default="")
    p.add_argument("--reps", type=int, default=200)
    args = p.parse_args()

    from gemma_tpu.ops.autotune import _dispatch_overhead, best_blocks
    from gemma_tpu.ops.matmul import matmul
    from gemma_tpu.utils.synth import synth_quant

    shapes = DEFAULT_SHAPES
    if args.shapes:
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in args.shapes.split(",")]
    overhead = _dispatch_overhead()
    rng = np.random.default_rng(0)

    print(f"{'kind':>5} {'M':>5} {'K':>6} {'N':>7} {'blocks':>18} "
          f"{'time':>10} {'GFLOP/s':>9} {'GB/s-eff':>9}")
    for kind in args.kinds.split(","):
        for m, k, n in shapes:
            if kind in ("nuq4", "i4") and k % 256:
                continue
            a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)
                            ).astype(jnp.bfloat16)
            w = synth_quant(rng, n, k, kind)

            @jax.jit
            def loop(a, w):
                def body(c, _):
                    out = matmul(c, w)
                    return c + (out[0, 0] * 1e-30).astype(c.dtype), ()
                f, _ = jax.lax.scan(body, a, None, length=args.reps)
                return f[0, 0]

            float(loop(a, w))
            t0 = time.perf_counter()
            float(loop(a, w))
            dt = max(time.perf_counter() - t0 - overhead, 1e-9) / args.reps
            gflops = 2 * m * k * n / dt / 1e9
            gbs = BYTES[kind] * k * n / dt / 1e9
            blocks = best_blocks(m, k, n, kind)
            print(f"{kind:>5} {m:>5} {k:>6} {n:>7} {str(blocks):>18} "
                  f"{dt * 1e6:9.1f}us {gflops:9.0f} {gbs:9.0f}")


if __name__ == "__main__":
    main()
