"""Device-side accuracy-dot options (maps ops/dot-inl.h:158-416).

The reference offers f64 and compensated (TwoProducts/TwoSums) dot kernels
for evals.  TPUs have no f64 datapath, so the TPU-native equivalents are
built from two facts:

  1. products of bf16-rounded inputs are EXACT in f32 (8-bit x 8-bit
     mantissas fit 24 bits), so for the reference's logits matmul
     (bf16(x) @ bf16-exact weights) ALL error is accumulation error;
  2. accumulation error can be compensated with TwoSum cascades
     (dot-inl.h:213-246) at f32.

`cascaded_dot` splits K into chunks, lets the MXU accumulate each chunk
in f32 (tree-order, ~log2(chunk) ulp), and combines the chunk partials
with an exact TwoSum cascade, so the cross-chunk error — the part that
grows with K — is eliminated.  `dot_f64` upcasts on the host for small
eval shapes where exactness beats speed (cross-entropy prompts are tens
of tokens).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def two_sum(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Error-free transform: a + b = s + err exactly (fp_arith-inl.h)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def cascaded_sum(parts: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Sum along `axis` with a running TwoSum compensation (the cascaded
    summation of sum-inl.h): exact up to one final rounding for the
    partials' magnitudes typical of chunked dots."""
    parts = jnp.moveaxis(parts, axis, 0)

    def step(carry, p):
        s, c = carry
        s, e = two_sum(s, p)
        return (s, c + e), None

    (s, c), _ = jax.lax.scan(
        step, (jnp.zeros_like(parts[0]), jnp.zeros_like(parts[0])), parts)
    return s + c


def cascaded_dot(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 512,
                 precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """C = A @ B^T with compensated cross-chunk accumulation.

    a: [M, K] (bf16 or f32), b: [N, K].  Each K-chunk runs on the MXU with
    f32 accumulation (HIGHEST precision uses the multi-pass bf16
    decomposition for f32 inputs, making products ~exact); chunk partials
    combine via TwoSum cascade.  Residual error: intra-chunk tree
    accumulation only (~log2(chunk) ulps), independent of K.
    """
    m, k = a.shape
    n, k2 = b.shape
    assert k == k2
    chunks = max(1, -(-k // chunk))
    kp = chunks * chunk
    if kp != k:
        a = jnp.pad(a, ((0, 0), (0, kp - k)))
        b = jnp.pad(b, ((0, 0), (0, kp - k)))
    parts = jnp.stack([
        jax.lax.dot_general(
            a[:, i * chunk : (i + 1) * chunk].astype(jnp.float32),
            b[:, i * chunk : (i + 1) * chunk].astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        for i in range(chunks)
    ])
    return cascaded_sum(parts, axis=0)


def dot_f64(a, b) -> np.ndarray:
    """Host f64 oracle dot (the kDouble option of dot-inl.h): exact-product
    f64 accumulation; for eval-sized shapes only."""
    return (np.asarray(a, np.float64) @ np.asarray(b, np.float64).T)
