"""KV cache (maps gemma/kv_cache.{h,cc}).

The reference keeps one 2-D ring buffer per query:
[seq_len, layers * kv_heads * qkv_dim * 2] with rows = pos % seq_len and
interleaved (k, v) per head (kv_cache.h:28-57).

TPU-first redesign: a single batched tensor

    kv: [batch, layers, seq_len, 2, kv_heads, qkv_dim]

kept in bf16 (KV_t is f32 in the reference, but its cache is written by
`Compress` which can narrow; bf16 halves HBM traffic in attention and
cross-entropy parity is checked end-to-end).  The ring indexing
(pos % seq_len) is a static-shape dynamic_update_slice under jit, matching
the reference's `div_seq_len.Remainder` wraparound (attention.cc:60-72).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gemma_tpu.models.configs import ModelConfig


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    kv: jnp.ndarray  # [batch, layers, seq_len, 2, kv_heads, qkv_dim]

    def tree_flatten(self):
        return [self.kv], None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def batch(self) -> int:
        return self.kv.shape[0]

    @property
    def seq_len(self) -> int:
        # One extra "garbage bin" row absorbs writes from padded slots so
        # the engine can run fixed token-batch shapes without recompiling.
        return self.kv.shape[2] - 1

    @classmethod
    def create(
        cls,
        config: ModelConfig,
        batch: int,
        seq_len: int | None = None,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        lc = config.layer_configs[0]
        seq_len = min(seq_len or config.max_seq_len, config.max_seq_len)
        kv = jnp.zeros(
            (batch, len(config.layer_configs), seq_len + 1, 2, lc.kv_heads,
             lc.qkv_dim),
            dtype,
        )
        return cls(kv)

    def copy(self) -> "KVCache":
        """Deep copy for conversation forking (kv_cache.cc:49-55)."""
        return KVCache(jnp.array(self.kv))

    def update(
        self,
        layer_idx: int,
        positions: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        valid: jnp.ndarray | None = None,
    ) -> "KVCache":
        """Write k/v at ring positions.

        positions: [batch, tokens] absolute positions (mod applied here)
        k, v:      [batch, tokens, kv_heads, qkv_dim]
        valid:     [batch, tokens] bool; invalid slots go to the garbage row.
        """
        seq_len = self.seq_len
        rows = positions % seq_len
        if valid is not None:
            rows = jnp.where(valid, rows, seq_len)
        kv_new = jnp.stack([k, v], axis=2)  # [batch, tokens, 2, heads, dim]
        # Scatter rows into the ring (batched dynamic update).
        updated = self.kv.at[:, layer_idx].set(
            _scatter_rows(self.kv[:, layer_idx], rows, kv_new)
        )
        return KVCache(updated)


def _scatter_rows(cache_layer, rows, kv_new):
    """cache_layer: [B, S, 2, H, D]; rows: [B, T]; kv_new: [B, T, 2, H, D]."""

    def per_query(cache_q, rows_q, new_q):
        return cache_q.at[rows_q].set(new_q)

    return jax.vmap(per_query)(cache_layer, rows, kv_new)
