"""Teacher-forcing cross-entropy — the numeric-parity oracle
(maps evals/cross_entropy.cc:99-150).

Semantics mirrored exactly:
  - first token contributes ln(vocab_size)  (== -ln(1/vocab))
  - every later prompt token contributes -max(ln p(token), -64)
  - probabilities from an exact f32 softmax of the final logits
  - result in bits (divided by ln 2); callers normalize by *string bytes*
    (benchmark_helper.cc:178-185) to get the published bits/byte numbers
    (2B: 1.14+-0.02 etc., evals/gemma_test.cc:153-174).

Implemented as chunked teacher-forced forwards (all-position logits) rather
than the reference's one-token-at-a-time sample_func — mathematically
identical, but prefill-speed on TPU.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from gemma_tpu.models.gemma import Params, forward
from gemma_tpu.models.kv_cache import KVCache


def compute_cross_entropy(
    params: Params,
    config,
    prompt: Sequence[int],
    max_tokens: int = 3072,
    chunk_size: int = 256,
    verbosity: int = 0,
    tokenizer=None,
    precise: str | bool = False,
    kv_kind: str | None = None,
) -> float:
    """Total cross-entropy of `prompt` in bits (ComputeCrossEntropy).

    precise: accuracy-dot options for the final logits (the dot-inl.h
    f64/compensated analogs, ops/accuracy.py):
      False       — production path: bf16 MXU logits dot (default).
      "cascaded"  — device compensated dot: HIGHEST-precision chunk dots +
                    TwoSum cascade across chunks.
      "f64"       — host f64 logits accumulation (exact; eval-sized only).
    Both precise modes also run softmax/log in f64 on the host.
    kv_kind: KV cache element kind ("f32" for reference-parity runs).
    """
    prompt = list(prompt)[:max_tokens]
    n = len(prompt)
    total_nats = math.log(config.vocab_size)  # first token
    if n < 2:
        return total_nats / math.log(2.0)

    emb_dense = None
    if precise:
        # Decoded embedding rows (includes the tensor scale), once.
        emb_dense = params.embedding.dequantize(jnp.float32)

    cache = KVCache.create(config, 1, min(config.max_seq_len, max(n, 2)),
                           kind=kv_kind or "bf16")
    pos = 0
    while pos < n - 1:
        c = min(chunk_size, n - 1 - pos)
        tokens = jnp.asarray(prompt[pos : pos + c], jnp.int32)[None, :]
        positions = jnp.arange(pos, pos + c, dtype=jnp.int32)[None, :]
        if precise:
            from gemma_tpu.models.gemma import forward_collect
            from gemma_tpu.ops.accuracy import cascaded_dot, dot_f64

            _, cache, collected = forward_collect(params, tokens, positions,
                                                  cache, config)
            xf = np.asarray(collected["final_norm"])[0]  # [c, d] bf16-rounded
            if precise == "f64":
                logits = dot_f64(xf, emb_dense)
            else:
                logits = np.asarray(cascaded_dot(
                    jnp.asarray(xf), emb_dense), np.float64)
            if config.final_cap:
                logits = config.final_cap * np.tanh(
                    logits / config.final_cap)
            m = logits.max(axis=-1, keepdims=True)
            e = np.exp(logits - m)
            probs = e / e.sum(axis=-1, keepdims=True)
            for i in range(c):
                tok = prompt[pos + i + 1]
                p = float(probs[i, tok])
                total_nats -= max(math.log(p) if p > 0 else -64.0, -64.0)
            pos += c
            continue
        logits, cache = forward(params, tokens, positions, cache, config,
                                return_logits="all")
        logits = np.asarray(logits[0], np.float32)  # [c, vocab]
        # Exact softmax probability of each next token (ops-inl.h:1125-1171).
        m = logits.max(axis=-1, keepdims=True)
        e = np.exp(logits - m)
        probs = e / e.sum(axis=-1, keepdims=True)
        for i in range(c):
            tok = prompt[pos + i + 1]
            p = float(probs[i, tok])
            nats = max(math.log(p) if p > 0 else -64.0, -64.0)
            total_nats -= nats
            if verbosity >= 3:
                name = tokenizer.decode([tok]) if tokenizer else ""
                print(f"pos {pos + i + 1:4d} token {tok:6d} = {name:<12s} "
                      f"{p:.10e} {-nats / math.log(2.0):14.10f} bits")
        pos += c
    return total_nats / math.log(2.0)
