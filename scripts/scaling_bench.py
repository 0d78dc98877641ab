"""Scaling-efficiency benchmark: decode throughput vs device count
(the BASELINE.md north-star: >=85% linear scaling on pod slices).

Runs the TP decode step on meshes of 1, 2, 4, ... devices and reports
tokens/sec and parallel efficiency.  On a CPU host it exercises the
sharding path functionally (with --devices N virtual devices); on real
multi-chip TPU slices it measures true ICI scaling.

    python scripts/scaling_bench.py [--model gemma2_2b] [--kind sfp]
        [--batch 16] [--seq 1024] [--steps 16] [--devices N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="gemma2_2b")
    p.add_argument("--kind", default="sfp")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--devices", type=int, default=0,
                   help="force N virtual CPU devices (0 = use real devices)")
    p.add_argument("--mode", default="tp",
                   choices=["tp", "sp", "cp", "pp"],
                   help="parallel mode: tp decode (default), sp prefill, "
                        "cp decode chunk, pp decode chunk — see "
                        "docs/PARALLEL.md")
    p.add_argument("--psum-share", action="store_true",
                   help="also time a collective-free (numerically wrong) "
                        "variant to report the psum/all_gather cost share")
    p.add_argument("--n_micro", type=int, default=0,
                   help="PP microbatches per step (0 = stage count; "
                        "utilization = m/(m+n-1), see scripts/pp_sweep.py "
                        "+ docs/PARALLEL.md for the sizing rule)")
    p.add_argument("--prefill", type=int, default=0,
                   help="also time a prefill chunk of this many tokens, "
                        "sync vs overlap_chunks=4 (VERDICT r1 weak #4)")
    args = p.parse_args()

    if args.devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.devices:
        jax.config.update("jax_platforms", "cpu")

    from gemma_tpu.models import configs as C
    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.parallel import (build_tp_step, make_mesh, shard_cache,
                                    shard_params)
    from gemma_tpu.utils.synth import synth_params

    if jax.default_backend() == "cpu":
        # Functional smoke only: interpret-mode kernels make real model
        # sizes impractical on CPU.
        from gemma_tpu.compression import Type

        lc = C.LayerConfig(model_dim=64, ff_hidden_dim=256, heads=8,
                           kv_heads=8, qkv_dim=32,
                           post_norm=C.PostNormType.SCALE)
        config = C.ModelConfig(
            model=C.Model.GEMMA2_2B, model_dim=64, vocab_size=256,
            max_seq_len=args.seq, num_layers=2, att_cap=50.0, final_cap=30.0,
            weight=Type.SFP)
        config.layer_configs = [lc, lc]
        config.attention_window_sizes = [args.seq, args.seq]
        args.seq = min(args.seq, 64)
        print("cpu backend: using a tiny functional-smoke config")
    else:
        config = getattr(C, f"config_{args.model}")()
    params_host = synth_params(config, kind=args.kind, seed=0, fuse_qkv=False)
    n_dev = len(jax.devices())

    sizes = []
    n = 1
    while n <= n_dev:
        sizes.append(n)
        n *= 2

    if args.mode != "tp":
        _run_mode(args, config, params_host, sizes)
        return

    base_tps = None
    for n in sizes:
        mesh = make_mesh(n, config)
        params = shard_params(params_host, config, mesh)
        cache = shard_cache(KVCache.create(config, args.batch, args.seq),
                            mesh)
        decode = build_tp_step(params, config, mesh, return_logits="last",
                               seq_len=args.seq)
        tokens = jnp.ones((args.batch, 1), jnp.int32)
        positions = jnp.full((args.batch, 1), args.seq // 2, jnp.int32)
        valid = jnp.ones((args.batch, 1), bool)
        pe = jnp.zeros((args.batch,), jnp.int32)

        def time_step(step_fn, cache):
            logits, cache = step_fn(params, tokens, positions, valid, pe,
                                    cache)
            np.asarray(logits)  # sync
            t0 = time.perf_counter()
            for _ in range(args.steps):
                logits, cache = step_fn(params, tokens, positions, valid,
                                        pe, cache)
            np.asarray(logits)
            return time.perf_counter() - t0, cache

        dt, cache = time_step(decode, cache)
        tps = args.batch * args.steps / dt
        if base_tps is None:
            base_tps = tps
        eff = tps / (base_tps * n)
        line = (f"devices={n:3d} mesh={dict(mesh.shape)} "
                f"{tps:10.1f} tok/s  efficiency={eff:6.1%}")
        if args.psum_share and n > 1:
            nocomm = build_tp_step(params, config, mesh,
                                   return_logits="last", seq_len=args.seq,
                                   collectives=False)
            cache2 = shard_cache(
                KVCache.create(config, args.batch, args.seq), mesh)
            dt_nc, _ = time_step(nocomm, cache2)
            line += f"  psum_share={(dt - dt_nc) / dt:6.1%}"
        print(line)

        if args.prefill:
            t = args.prefill
            ptokens = jnp.ones((args.batch, t), jnp.int32)
            ppos = jnp.tile(jnp.arange(t, dtype=jnp.int32),
                            (args.batch, 1))
            pvalid = jnp.ones((args.batch, t), bool)
            for chunks, label in ((1, "sync"), (4, "overlap4")):
                step = build_tp_step(params, config, mesh,
                                     return_logits="none", seq_len=args.seq,
                                     overlap_chunks=chunks)
                c = shard_cache(KVCache.create(config, args.batch, args.seq),
                                mesh)
                c = step(params, ptokens, ppos, pvalid, pe, c)
                jax.block_until_ready(c.kv)
                t0 = time.perf_counter()
                for _ in range(max(args.steps // 4, 2)):
                    c = step(params, ptokens, ppos, pvalid, pe, c)
                jax.block_until_ready(c.kv)
                dt_p = time.perf_counter() - t0
                per = dt_p / max(args.steps // 4, 2)
                print(f"  prefill[{t} tok, {label:>8s}]: {per*1e3:8.2f} ms "
                      f"({args.batch * t / per:10.0f} tok/s)")


def _run_mode(args, config, params_host, sizes) -> None:
    """SP prefill / CP decode / PP decode scaling (docs/PARALLEL.md)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.parallel import (build_sp_prefill, make_mesh,
                                    scatter_into_cache, shard_cache_cp,
                                    shard_cache_pp, stack_layers)
    from gemma_tpu.parallel.cp import build_cp_decode_chunk
    from gemma_tpu.parallel.pp import build_pp_decode_chunk

    rng = np.random.default_rng(0)
    base = None
    L = len(config.layer_configs)
    for n in sizes:
        mesh = make_mesh(n, config)
        if args.mode == "sp":
            t = max(args.prefill or args.seq // 2, 8 * n)
            t -= t % n
            tokens = jnp.asarray(
                rng.integers(0, config.vocab_size, (args.batch, t)),
                jnp.int32)
            positions = jnp.tile(jnp.arange(t, dtype=jnp.int32),
                                 (args.batch, 1))
            pe = jnp.zeros((args.batch,), jnp.int32)
            sp = build_sp_prefill(config, mesh)
            x, _, _ = sp(params_host, tokens, positions, pe)
            np.asarray(x[:, -1])
            reps = max(args.steps // 4, 2)
            t0 = time.perf_counter()
            for _ in range(reps):
                x, _, _ = sp(params_host, tokens, positions, pe)
            np.asarray(x[:, -1])
            tps = args.batch * t * reps / (time.perf_counter() - t0)
            work = args.batch * t
        else:
            kind = "pp" if args.mode == "pp" else "cp"
            if kind == "pp" and L % n:
                print(f"devices={n:3d} skipped ({L} layers % {n} stages)")
                continue
            cache = KVCache.create(config, args.batch, args.seq,
                                   split_local=(kind == "cp"))
            if kind == "cp" and cache.kv.shape[4] % n:
                print(f"devices={n:3d} skipped (ring alloc "
                      f"{cache.kv.shape[4]} % {n})")
                continue
            tok = jnp.full((args.batch, 1), 7, jnp.int32)
            pos = jnp.full((args.batch, 1), args.seq // 2, jnp.int32)
            if kind == "cp":
                c = shard_cache_cp(cache, mesh)
                chunk = build_cp_decode_chunk(config, mesh, c, args.steps)
                fn = lambda c: chunk(params_host, tok, pos, c)  # noqa: E731
            else:
                c = shard_cache_pp(cache, mesh)
                chunk = build_pp_decode_chunk(
                    config, mesh, c, args.steps,
                    n_micro=args.n_micro or None)
                stacked = stack_layers(params_host)
                fn = lambda c: chunk(  # noqa: E731
                    stacked, params_host.embedding, params_host.final_norm,
                    tok, pos, c)
            toks, c = fn(c)
            np.asarray(toks)
            t0 = time.perf_counter()
            toks, c = fn(c)
            np.asarray(toks)
            dt = time.perf_counter() - t0
            tps = args.batch * args.steps / dt
            work = args.batch * args.steps
        if base is None:
            base = tps
        eff = tps / (base * n)
        print(f"devices={n:3d} mode={args.mode} {tps:10.1f} tok/s "
              f"({work} tokens/round)  efficiency={eff:6.1%}")


if __name__ == "__main__":
    main()
