"""Token sampling (maps ops-inl.h:1180-1398 + gemma/gemma.cc:459-485).

Jit-friendly: top-k is a fixed-k lax.top_k, the categorical draw uses a
counter-based key derived from (seed, query, position) so results are
reproducible regardless of batching (the reference's AES-CTR RngStream
semantics, gemma/gemma.cc:470-477).

Temperature matches `create_distribution` (ops-inl.h:1314-1334): the top-k
probabilities are raised to 1/T and renormalized; T=0 degenerates to argmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gemma_tpu.ops.ops import softmax

# Large-negative filler for masked-out logits (finite so softmax over a
# fully-masked row cannot NaN); matches ops/attention.py's mask value.
NEG_INF = -2.3819763e38


def top1(logits: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy: (token, prob). Maps Top1OfSoftmax (ops-inl.h:1228-1257)."""
    lf = logits.astype(jnp.float32)
    token = jnp.argmax(lf, axis=-1)
    m = jnp.max(lf, axis=-1, keepdims=True)
    e = jnp.exp(lf - m)
    prob = jnp.take_along_axis(e, token[..., None], axis=-1)[..., 0] / jnp.sum(
        e, axis=-1
    )
    return token.astype(jnp.int32), prob


def sample_top_k(
    logits: jnp.ndarray,
    key: jax.Array,
    top_k: int,
    temperature: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k sampling over the last axis; returns (token, prob).

    Equivalent to FusedSoftmaxAndSampleTopK (ops-inl.h:1375-1398): softmax
    restricted to the top-k logits, then temperature-adjusted categorical
    with create_distribution's p^(1/T) re-normalization (ops-inl.h:1314-1334;
    the fused path's uniform exp-scaling by 1/T cancels in normalization and
    is a no-op — this implements the canonical SampleTopK semantics).
    """
    lf = logits.astype(jnp.float32)
    topk_logits, topk_idx = jax.lax.top_k(lf, top_k)
    return _draw_from_topk(topk_logits, topk_idx, key, temperature)


def _draw_from_topk(topk_logits, topk_idx, key, temperature: float):
    """Categorical draw over pre-selected top-k (logits, indices) rows —
    the back half of FusedSoftmaxAndSampleTopK (ops-inl.h:1375-1398)."""
    probs = softmax(topk_logits, axis=-1)
    if temperature == 0.0:
        choice = jnp.zeros(probs.shape[:-1], jnp.int32)
    elif temperature != 1.0:
        adj = jnp.power(probs, 1.0 / temperature)
        adj = adj / jnp.sum(adj, axis=-1, keepdims=True)
        choice = jax.random.categorical(key, jnp.log(adj), axis=-1)
    else:
        choice = jax.random.categorical(key, jnp.log(probs), axis=-1)
    token = jnp.take_along_axis(topk_idx, choice[..., None], axis=-1)[..., 0]
    prob = jnp.take_along_axis(probs, choice[..., None], axis=-1)[..., 0]
    return token.astype(jnp.int32), prob


def sample_from_topk(vals, idxs, keys, temperature: float):
    """Batched draw from fused top-k head output (matmul_topk): vals/idxs
    [B, k] descending, keys [B, 2] per-(query, pos) streams.  Identical
    sampling semantics to make_sampler's top-k path given the same
    selection."""
    return jax.vmap(
        functools.partial(_draw_from_topk, temperature=temperature)
    )(vals, idxs, keys)


def make_sampler(top_k: int, temperature: float):
    """Returns sample(logits[B, V], keys[B, 2]) -> (tokens[B], probs[B]).

    Maps ChooseSampleFunc (gemma/gemma.cc:459-485): top_k == 1 takes the
    fused argmax path.
    """
    if top_k == 1:

        def sample(logits, keys):
            del keys
            return top1(logits)

        return sample

    @functools.partial(jax.vmap, in_axes=(0, 0))
    def sample(logits, key):
        return sample_top_k(logits, key, top_k, temperature)

    return sample
