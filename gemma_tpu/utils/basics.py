"""Core shared types and helpers (maps reference util/basics.h).

The reference defines BF16, Tristate, TokenAndProb, kMaxBatchSize and an
AES-CTR counter RNG (util/basics.h:34,150-196).  On TPU we use jax.random's
counter-based threefry instead of AES-CTR: `sample_key(seed, qi, pos)` folds
the (query, position) pair into the key, preserving the reference's semantics
of one independent stream per (query index, position) (gemma/gemma.cc:470-477)
without any sequential state.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

# Reference: util/basics.h:34 (kMaxBatchSize = 4096).
MAX_BATCH_SIZE = 4096

# Reference: gemma/tokenizer.h:29 (BOS_ID = 2).
BOS_ID = 2


@dataclasses.dataclass
class TokenAndProb:
    """Maps reference util/basics.h TokenAndProb."""

    token: int
    prob: float


def sample_key(seed: int, qi: int, pos: int) -> jax.Array:
    """Independent PRNG stream per (query, position).

    Maps the reference's `RngStream(engine, (qi << 32) | pos)`
    (gemma/gemma.cc:470-477): reproducible regardless of decode batching.
    """
    key = jax.random.PRNGKey(seed)
    return jax.random.fold_in(jax.random.fold_in(key, qi), pos)


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def f32_to_bf16_truncate(x: np.ndarray) -> np.ndarray:
    """Truncate f32 to bf16 by chopping the low 16 bits (no rounding).

    The reference's SFP encoder truncates rather than rounds because the SFP
    rounding step follows (compression/sfp-inl.h:478-480).
    """
    u = np.ascontiguousarray(x, dtype=np.float32).view(np.uint32)
    return (u >> 16).astype(np.uint16)


def f32_to_bf16_round(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even f32 -> bf16 bit pattern (uint16)."""
    return np.asarray(x, dtype=np.float32).astype(np.dtype("bfloat16")).view(np.uint16)


def bf16_bits_to_f32(u16: np.ndarray) -> np.ndarray:
    """Expand bf16 bit patterns (uint16) to f32."""
    return (np.asarray(u16, dtype=np.uint32) << 16).view(np.float32)
