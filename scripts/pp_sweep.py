"""Pipeline-parallel microbatch sweep: utilization + drift vs m.

Runs the PP decode step (parallel/pp.py) at m microbatches over n stages
on a virtual CPU mesh, confirming the tick-counted utilization equals
m/(m+n-1) for every point and measuring the logits drift vs the m=1
composed step (per-microbatch M changes XLA's f32 reduction order inside
every GEMM — the same bound class as tests/test_pp.py).  The resulting
sizing rule lives in docs/PARALLEL.md.

Usage: python scripts/pp_sweep.py [--stages 4,8] [--ms 1,2,4,8]
(Sets up its own 8-device CPU mesh; run OFF the TPU tunnel.)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="4,8")
    p.add_argument("--ms", default="1,2,4,8")
    args = p.parse_args()
    stage_list = [int(x) for x in args.stages.split(",")]
    m_list = [int(x) for x in args.ms.split(",")]

    n_dev = max(stage_list)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _toy_config
    from gemma_tpu.models.gemma import forward
    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.parallel import (build_pp_decode, make_mesh,
                                    shard_cache_pp, stack_layers)
    from gemma_tpu.utils.synth import synth_params

    print(f"{'stages':>6} {'m':>3} {'busy/total':>11} {'util':>6} "
          f"{'m/(m+n-1)':>9} {'max_drift':>10}")
    for n in stage_list:
        config = _toy_config(num_layers=2 * n, seq=64)
        params = synth_params(config, kind="sfp", seed=17)
        batch, t = 2 * max(m_list), 16
        rng = np.random.default_rng(17)
        tokens = jnp.asarray(
            rng.integers(0, config.vocab_size, (batch, t)).astype(np.int32))
        positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (batch, 1))
        cache = KVCache.create(config, batch, config.max_seq_len - 1,
                               split_local=False)
        _, cache = forward(params, tokens, positions, cache, config,
                           return_logits="none")
        tok = jnp.full((batch, 1), 7, jnp.int32)
        pos = jnp.full((batch, 1), t, jnp.int32)
        mesh = make_mesh(n, data=1, model=n)
        stacked = stack_layers(params)

        ref_cache = shard_cache_pp(cache.copy(), mesh)
        want, _ = build_pp_decode(config, mesh, ref_cache, n_micro=1)(
            stacked, params.embedding, params.final_norm, tok, pos,
            ref_cache)
        want = np.asarray(want)

        for m in m_list:
            pp_cache = shard_cache_pp(cache.copy(), mesh)
            step = build_pp_decode(config, mesh, pp_cache, n_micro=m,
                                   with_ticks=True)
            logits, _, busy = step(stacked, params.embedding,
                                   params.final_norm, tok, pos, pp_cache)
            busy = int(np.asarray(busy).ravel()[0])
            total = n * (m + n - 1)
            drift = float(np.max(np.abs(np.asarray(logits) - want)
                                 / (np.abs(want) + 1.0)))
            ok = busy == m * n
            print(f"{n:>6} {m:>3} {busy:>6}/{total:<4} {busy / total:>6.3f} "
                  f"{m / (m + n - 1):>9.3f} {drift:>10.2e}"
                  f"{'' if ok else '  UTIL MISMATCH'}")
            assert ok, (n, m, busy)


if __name__ == "__main__":
    main()
