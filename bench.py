"""Headline benchmark: Gemma2-2B SFP batched decode throughput on one chip.

Mirrors the reference's gemma_batch_bench (evals/gemma_batch_bench.cc:51-140:
decode_qbatch-sized batch, tokens/sec) with synthetic weights in the exact
production layout (see gemma_tpu/utils/synth.py).  The decode loop runs fully
on-device via lax.scan.

vs_baseline: the reference publishes no absolute tokens/sec (BASELINE.md), so
the comparison anchor is the HBM-bandwidth speed-of-light for this chip:
batched decode is bandwidth-bound reading the full weight set (+KV) per step,
so SOL tok/s = batch / (bytes_per_step / HBM_BW).  vs_baseline = fraction of
speed-of-light achieved (1.0 = perfect).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# GB/s per chip (public figures; used only to normalize vs_baseline).
HBM_BW = {
    "v2": 700e9, "v3": 900e9, "v4": 1228e9,
    "v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9,
    "v6 lite": 1640e9, "v6e": 1640e9,
}


def device_hbm_bw() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in sorted(HBM_BW.items(), key=lambda kv: -len(kv[0])):
        if key in kind:
            return bw
    return 819e9


def params_bytes(params) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize
    return total


def main() -> None:
    from gemma_tpu.models.configs import config_gemma2_2b
    from gemma_tpu.models.gemma import forward
    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.utils.synth import synth_params

    on_tpu = jax.default_backend() not in ("cpu",)
    config = config_gemma2_2b()
    batch, seq_len, steps = 16, 1024, 32
    if not on_tpu:  # smoke-test mode off-TPU
        config.num_layers = 2
        config.layer_configs = config.layer_configs[:2]
        config.attention_window_sizes = config.attention_window_sizes[:2]
        config.vocab_size = 2048
        batch, seq_len, steps = 4, 128, 4

    print(f"synthesizing {config.specifier()} weights...", file=sys.stderr)
    params = synth_params(config, kind="sfp", seed=0)
    params = jax.device_put(params)
    w_bytes = params_bytes(params)
    cache = KVCache.create(config, batch, seq_len)

    start_pos = seq_len // 2

    @jax.jit
    def decode_n(params, cache, first_tokens):
        def body(carry, _):
            prev, pos, cache = carry
            logits, cache = forward(params, prev[:, None], pos[:, None],
                                    cache, config, return_logits="last")
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (tok, pos + 1, cache), tok

        pos0 = jnp.full((batch,), start_pos, jnp.int32)
        (_, _, cache), tokens = jax.lax.scan(
            body, (first_tokens, pos0, cache), None, length=steps)
        return tokens, cache

    first = jnp.ones((batch,), jnp.int32)
    print("compiling + warmup...", file=sys.stderr)
    tokens, _ = decode_n(params, cache, first)
    np.asarray(tokens)  # full sync (block_until_ready is unreliable on axon)

    t0 = time.monotonic()
    tokens, _ = decode_n(params, cache, first)
    np.asarray(tokens)
    dt = time.monotonic() - t0

    tok_s = batch * steps / dt

    # Speed-of-light: per decode step, the chip must read all weights once
    # (batch shares them) plus each query's live KV span.
    lc = config.layer_configs[0]
    kv_bytes_per_q = (len(config.layer_configs) * start_pos * 2
                      * lc.kv_heads * lc.qkv_dim * 2)
    bytes_per_step = w_bytes + batch * kv_bytes_per_q
    sol_tok_s = batch / (bytes_per_step / device_hbm_bw())
    vs = tok_s / sol_tok_s

    print(
        f"decode: {tok_s:.1f} tok/s (batch={batch}, steps={steps}, "
        f"dt={dt*1e3:.1f}ms, weights={w_bytes/1e9:.2f}GB, "
        f"SOL={sol_tok_s:.1f} tok/s on {jax.devices()[0].device_kind})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "gemma2_2b_sfp_decode_b16",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
