"""Decode-step stage ablation: where do the 5.5 ms go?

Times the 2B decode step with stages knocked out (numerically wrong, but
the HBM/kernel cost of the remaining stages is unchanged), isolating:

  full        — the real step
  no_logits   — return_logits="none" (embedding matmul + softcap removed)
  no_attn     — attention + KV write replaced by a reshape of q
  no_element  — norms/residuals/rope removed (GEMMs chained raw)
  gemms_only  — no_attn + no_element + no_logits

Run on the TPU host:  python scripts/decode_ablate.py [--kind i8]
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


def build_step(config, variant: str):
    from gemma_tpu.models.configs import PostNormType
    from gemma_tpu.ops import ops
    from gemma_tpu.ops.decode_attention import decode_attention, kv_write_decode
    from gemma_tpu.ops.matmul import gated_ffn, matmul

    lc = config.layer_configs[0]
    heads, kv_heads, qkv_dim = lc.heads, lc.kv_heads, lc.qkv_dim
    d = config.model_dim
    no_attn = variant in ("no_attn", "gemms_only")
    no_elem = variant in ("no_element", "gemms_only")
    no_logits = variant in ("no_logits", "gemms_only")

    def step(params, prev, pos, cache):
        from gemma_tpu.models.gemma import _position_encode, embed_tokens

        b = prev.shape[0]
        x = embed_tokens(params.embedding, prev[:, None], d)
        positions = pos[:, None]
        inv_ts = jnp.asarray(ops.create_inv_timescale(qkv_dim, False))
        for layer_idx, layer in enumerate(params.layers):
            lci = config.layer_configs[layer_idx]
            if no_elem:
                x_norm = x.reshape(b, d)
            else:
                x_norm = ops.rms_norm(x, layer.pre_att_norm).reshape(b, d)
            x_bf = x_norm.astype(jnp.bfloat16)
            q = matmul(x_bf, layer.qkv1, out_dtype=jnp.float32)
            kv = matmul(x_bf, layer.qkv2, out_dtype=jnp.float32)
            q = q.reshape(b, 1, heads, qkv_dim)
            kvr = kv.reshape(b, 1, kv_heads, 2, qkv_dim)
            k, v = kvr[..., 0, :], kvr[..., 1, :]
            if no_attn:
                att = q
            else:
                if not no_elem:
                    k = _position_encode(k, positions, inv_ts, 1.0, lci.post_qk)
                    q = _position_encode(q, positions, inv_ts,
                                         config.query_scale_value(),
                                         lci.post_qk)
                cache = kv_write_decode(cache, layer_idx, positions, k, v)
                att = decode_attention(
                    cache, layer_idx, q, positions,
                    config.attention_window_sizes[layer_idx],
                    att_cap=config.att_cap)
            att = att.reshape(b, heads * qkv_dim).astype(jnp.bfloat16)
            att_sums = matmul(att, layer.att_w, out_dtype=jnp.float32)
            att_sums = att_sums.reshape(b, 1, d)
            if not no_elem:
                if lci.post_norm == PostNormType.SCALE:
                    att_sums = ops.rms_norm(att_sums, layer.post_att_norm)
                x = x + att_sums
            else:
                x = att_sums
            if no_elem:
                y_bf = x.reshape(b, d).astype(jnp.bfloat16)
            else:
                y_bf = ops.rms_norm(x, layer.pre_ffw_norm).reshape(
                    b, d).astype(jnp.bfloat16)
            act = gated_ffn(y_bf, layer.gating1, layer.gating2,
                            out_dtype=jnp.bfloat16)
            ffw = matmul(act, layer.linear, out_dtype=jnp.float32)
            ffw = ffw.reshape(b, 1, d)
            if not no_elem:
                if lci.post_norm == PostNormType.SCALE:
                    ffw = ops.rms_norm(ffw, layer.post_ffw_norm)
                x = x + ffw
            else:
                x = ffw
        if no_logits:
            return jnp.zeros((b,), jnp.int32), x.sum(), cache
        x_bf = ops.rms_norm(x, params.final_norm).astype(jnp.bfloat16)
        logits = matmul(x_bf.reshape(b, d), params.embedding,
                        out_dtype=jnp.float32)
        logits = ops.soft_cap(config.final_cap, logits)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return tok, logits[0, 0], cache

    return step


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--kind", default="i8")
    p.add_argument("--kv_kind", default="i8")
    p.add_argument("--batch", type=int, default=16)
    # >=100 scan iterations per dispatch and min-of-4 dispatches: at 64x2
    # the ~24 ms tunnel dispatch variance (~0.4 ms/step) is the same
    # order as the per-stage deltas this script exists to resolve.
    p.add_argument("--steps", type=int, default=192)
    p.add_argument("--variants", default="full,no_logits,no_attn,"
                                         "no_element,gemms_only")
    args = p.parse_args()

    from gemma_tpu.models.configs import config_gemma2_2b
    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.ops.autotune import _dispatch_overhead
    from gemma_tpu.utils.synth import synth_params

    config = config_gemma2_2b()
    params = jax.device_put(synth_params(config, kind=args.kind, seed=0,
                                     fuse_qkv=False))
    seq = 1024
    overhead = _dispatch_overhead()

    results = {}
    for variant in args.variants.split(","):
        cache = KVCache.create(config, args.batch, seq, kind=args.kv_kind)
        step = build_step(config, variant)

        @jax.jit
        def run(params, cache, step=step):
            def body(carry, _):
                prev, pos, cache = carry
                tok, _, cache = step(params, prev, pos, cache)
                return (tok % config.vocab_size, pos + 1, cache), ()

            pos0 = jnp.full((args.batch,), seq // 2, jnp.int32)
            first = jnp.ones((args.batch,), jnp.int32)
            (tok, _, cache), _ = jax.lax.scan(
                body, (first, pos0, cache), None, length=args.steps)
            return tok, cache

        tok, _ = run(params, cache)
        np.asarray(tok)
        dts = []
        for _ in range(4):
            t0 = time.monotonic()
            tok, _ = run(params, cache)
            np.asarray(tok)
            dts.append(time.monotonic() - t0)
        dt = max(min(dts) - overhead, 1e-9) / args.steps
        results[variant] = dt
        print(f"{variant:>12}: {dt * 1e3:7.3f} ms/step")

    full = results.get("full")
    if full:
        for k, v in results.items():
            if k != "full":
                print(f"  {k:>12} saves {1e3 * (full - v):6.3f} ms")


if __name__ == "__main__":
    main()
