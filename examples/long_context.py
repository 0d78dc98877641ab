"""Long-context serving across a TPU mesh: SP prefill -> CP decode.

The reference's context ceiling is one node's memory (gemma/kv_cache.h:
one seq_len-row ring per query).  On a TPU mesh the same model serves
contexts n-times larger with TWO collectives per layer:

  1. Sequence-parallel prefill (parallel/sp.py): the prompt's T dimension
     is sharded over the mesh; KV blocks rotate on the ICI ring
     (`ppermute`) inside each layer's blockwise attention, so per-chip
     activation AND attention memory drop n-fold.
  2. Context-parallel decode (parallel/cp.py): the global-layer KV pools
     stay sharded over their ring dimension; each step attends the
     resident block and merges with a pmax/psum whose payload is
     O(batch * heads * head_dim) — independent of context length.

Run on any mesh (demo sizes fit a CPU host):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/long_context.py --devices 8

`--mode pp` swaps stage 2/3 for the pipeline-parallel handoff
(parallel/pp.py): the SP-prefilled KV lands in a UNIFORM pool whose layer
dim reshards into pipeline stages (`shard_cache_pp`), then PP decodes with
one ppermute hop per microbatch per step — the cross-DCN axis, vs CP/TP's
per-layer collectives over ICI.

With real weights, replace synth_params with
models/gemma.py:load_params(model_store) and scale seq/prompt up.
"""

import argparse
import sys


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--seq_len", type=int, default=511,
                        help="ring length; padded alloc must divide the mesh")
    parser.add_argument("--prompt_len", type=int, default=128)
    parser.add_argument("--steps", type=int, default=16)
    parser.add_argument("--mode", choices=("cp", "pp"), default="cp",
                        help="decode axis after the SP prefill: context-"
                        "parallel (ring-sharded KV) or pipeline-parallel "
                        "(layer-sharded stages)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemma_tpu.models.configs import (LayerConfig, Model, ModelConfig,
                                          PostNormType, QueryScaleType)
    from gemma_tpu.compression import Type
    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.parallel import (build_cp_decode, build_sp_prefill,
                                    make_mesh, scatter_into_cache,
                                    shard_cache_cp, shard_cache_pp,
                                    stack_layers)
    from gemma_tpu.parallel.cp import build_cp_decode_chunk
    from gemma_tpu.parallel.pp import build_pp_decode_chunk
    from gemma_tpu.utils.synth import synth_params

    # A Gemma-shaped toy (local/global interleave like Gemma3): swap in a
    # real config + load_params for production.
    model_dim, heads, kv_heads, qkv_dim, ff = 64, 4, 2, 32, 128
    lc = LayerConfig(model_dim=model_dim, ff_hidden_dim=ff, heads=heads,
                     kv_heads=kv_heads, qkv_dim=qkv_dim,
                     post_norm=PostNormType.SCALE)
    config = ModelConfig(
        model=Model.GEMMA2_2B, model_dim=model_dim, vocab_size=256,
        max_seq_len=args.seq_len + 1, num_layers=4, att_cap=50.0,
        final_cap=30.0, query_scale=QueryScaleType.SQRT_KEY_SIZE,
        weight=Type.SFP)
    mesh = make_mesh(args.devices)
    n = mesh.shape["model"]
    # PP shards the layer dim into stages: use n layers there.
    n_layers = max(4, n) if args.mode == "pp" else 4
    config.num_layers = n_layers
    config.layer_configs = [lc] * n_layers
    config.attention_window_sizes = ([128, args.seq_len + 1]
                                     * ((n_layers + 1) // 2))[:n_layers]
    params = synth_params(config, kind="sfp", seed=0)

    batch, t = 2, args.prompt_len
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, config.vocab_size, (batch, t)), jnp.int32)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (batch, 1))

    print(f"[1/3] SP prefill: {t} tokens over {n} shards "
          f"({t // n} per chip)")
    sp = build_sp_prefill(config, mesh)
    x, ks, vs = sp(params, tokens, positions,
                   jnp.zeros((batch,), jnp.int32))

    first = jnp.argmax(
        _logits_head(config, params, x[:, -1, :]), axis=-1
    ).astype(jnp.int32)[:, None]
    pos0 = jnp.full((batch, 1), t, jnp.int32)

    if args.mode == "pp":
        print(f"[2/3] scatter into a UNIFORM-pool cache; layer dim "
              f"resharded into {n} pipeline stages")
        cache = scatter_into_cache(
            KVCache.create(config, batch, args.seq_len,
                           split_local=False), ks, vs, positions)
        cache = shard_cache_pp(cache, mesh)

        print(f"[3/3] PP decode: {args.steps} greedy steps, "
              f"{batch} microbatches, one ppermute hop per stage")
        chunk = build_pp_decode_chunk(config, mesh, cache, args.steps,
                                      n_micro=batch)
        toks, cache = chunk(stack_layers(params), params.embedding,
                            params.final_norm, first, pos0, cache)
    else:
        print(f"[2/3] scatter into the KV cache, global pools sharded "
              f"over the ring dim")
        cache = scatter_into_cache(
            KVCache.create(config, batch, args.seq_len), ks, vs, positions)
        cache = shard_cache_cp(cache, mesh)

        print(f"[3/3] CP decode: {args.steps} greedy steps, "
              f"O(B*H*D) merge per global layer")
        chunk = build_cp_decode_chunk(config, mesh, cache, args.steps)
        toks, cache = chunk(params, first, pos0, cache)
    print("generated token ids:")
    for b in range(batch):
        print(f"  query {b}: {[int(v) for v in np.asarray(toks[b])]}")


def _logits_head(config, params, x_last):
    import jax.numpy as jnp

    from gemma_tpu.ops.matmul import matmul
    from gemma_tpu.ops.ops import soft_cap

    logits = matmul(x_last, params.embedding, out_dtype=jnp.float32,
                    prologue_norm=params.final_norm)
    return soft_cap(config.final_cap, logits)


if __name__ == "__main__":
    sys.exit(main())
