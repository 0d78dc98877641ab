"""Scan-over-layers decode A/B: unrolled vs lax.scan step on hardware.

Measures, for the headline decode config (Gemma2-2B i8 weights + i8 KV,
B16 S1024, 64 steps inside one lax.scan executable):

  - decode tok/s for the unrolled forward and the scan forward
  - compile wall time of each executable
  - compiled-HLO op counts (fusion / custom-call) — the executable-size
    reduction VERDICT r3 #3 asks to measure, not estimate

Usage (TPU host; CPU works for op counts only, timings meaningless):

    python scripts/scan_ablate.py [--model gemma2_2b] [--kind i8]
        [--batch 16] [--seq 1024] [--steps 64]
"""

import argparse
import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def hlo_op_counts(compiled) -> dict:
    """fusion/custom-call counts of a compiled executable's optimized HLO."""
    txt = compiled.as_text()
    counts = collections.Counter()
    for m in re.finditer(r"=\s*[\w\[\],{}/#\s]*\s(fusion|custom-call)\(",
                         txt):
        counts[m.group(1)] += 1
    counts["total_instructions"] = sum(
        1 for _ in re.finditer(r"^\s*(?:ROOT\s+)?%?[\w.-]+\s*=", txt, re.M))
    return dict(counts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gemma2_2b")
    ap.add_argument("--kind", default="i8")
    ap.add_argument("--kv_kind", default="i8")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    from gemma_tpu.engine.scan_decode import build_scan_params, forward_scan
    from gemma_tpu.models import configs as C
    from gemma_tpu.models.gemma import forward
    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.ops.autotune import _dispatch_overhead
    from gemma_tpu.utils.synth import synth_params

    config = getattr(C, f"config_{args.model}")()
    params = jax.device_put(synth_params(config, kind=args.kind, seed=0))
    sparams = build_scan_params(params, config)
    assert sparams is not None, "model/kind not stackable"
    batch, seq, steps = args.batch, args.seq, args.steps
    start_pos = seq // 2

    def make(fwd):
        def decode_n(p, cache, first):
            def body(carry, _):
                prev, pos, cache = carry
                (tok, _), cache = fwd(p, prev[:, None], pos[:, None],
                                      cache, config, return_logits="top1")
                tok = tok.astype(jnp.int32)
                return (tok, pos + 1, cache), tok

            pos0 = jnp.full((batch,), start_pos, jnp.int32)
            (_, _, cache), tokens = jax.lax.scan(
                body, (first, pos0, cache), None, length=steps)
            return tokens, cache

        return jax.jit(decode_n)

    first = jnp.ones((batch,), jnp.int32)
    overhead = _dispatch_overhead()
    results = {}
    for name, fwd, p in (("unrolled", forward, params),
                         ("scan", forward_scan, sparams)):
        cache = KVCache.create(config, batch, seq, kind=args.kv_kind)
        fn = make(fwd)
        t0 = time.monotonic()
        lowered = fn.lower(p, cache, first)
        compiled = lowered.compile()
        compile_s = time.monotonic() - t0
        ops = hlo_op_counts(compiled)
        tokens, cache2 = compiled(p, cache, first)
        np.asarray(tokens)  # sync
        dts = []
        for _ in range(3):
            t0 = time.monotonic()
            tokens, _ = compiled(p, cache, first)
            np.asarray(tokens)
            dts.append(time.monotonic() - t0)
        dt = max(min(dts) - overhead, 1e-9)
        results[name] = {
            "tok_s": round(batch * steps / dt, 1),
            "step_us": round(dt / steps * 1e6, 1),
            "compile_s": round(compile_s, 1),
            **ops,
        }
        print(f"{name}: {results[name]}")
        del cache, cache2, fn, compiled

    u, s = results["unrolled"], results["scan"]
    print(f"\nscan vs unrolled: {s['tok_s'] / u['tok_s']:.3f}x tok/s, "
          f"{u['total_instructions'] / max(s['total_instructions'], 1):.1f}x"
          f" fewer HLO instructions, "
          f"{u['compile_s'] / max(s['compile_s'], 1e-9):.1f}x faster compile")


if __name__ == "__main__":
    main()
