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
                                    shard_cache_cp)
    from gemma_tpu.parallel.cp import build_cp_decode_chunk
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
    config.layer_configs = [lc] * 4
    config.attention_window_sizes = [128, args.seq_len + 1] * 2

    mesh = make_mesh(args.devices)
    n = mesh.shape["model"]
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

    print(f"[2/3] scatter into the KV cache, global pools sharded over "
          f"the ring dim")
    cache = scatter_into_cache(
        KVCache.create(config, batch, args.seq_len), ks, vs, positions)
    cache = shard_cache_cp(cache, mesh)

    print(f"[3/3] CP decode: {args.steps} greedy steps, "
          f"O(B*H*D) merge per global layer")
    first = jnp.argmax(
        _logits_head(config, params, x[:, -1, :]), axis=-1
    ).astype(jnp.int32)[:, None]
    chunk = build_cp_decode_chunk(config, mesh, cache, args.steps)
    toks, cache = chunk(params, first,
                        jnp.full((batch, 1), t, jnp.int32), cache)
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
