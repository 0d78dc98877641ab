"""KV cache (maps gemma/kv_cache.{h,cc}).

The reference keeps one 2-D ring buffer per query:
[seq_len, layers * kv_heads * qkv_dim * 2] with rows = pos % seq_len and
interleaved (k, v) pairs (kv_cache.h:28-57).

TPU-first redesign: a single batched tensor

    kv: [batch, layers, 2, kv_heads, s_alloc, qkv_dim]   (bf16)

with [S, D] innermost so one (batch, layer, k/v, head) slice is a
contiguous MXU-ready [seq, qkv_dim] panel for the Pallas decode-attention
kernel (ops/decode_attention.py).  s_alloc = seq_len rounded up to the
16-row bf16 tile plus at least one "garbage" row that absorbs writes from
padded prefill slots, so fixed token-batch shapes never recompile.

KV_t is f32 in the reference but written via `Compress` which can narrow;
bf16 halves HBM traffic in attention and cross-entropy parity is checked
end-to-end.  Ring indexing (pos % seq_len) matches the reference's
`div_seq_len.Remainder` wraparound (attention.cc:60-72).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gemma_tpu.models.configs import ModelConfig
from gemma_tpu.utils.basics import round_up


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    kv: jnp.ndarray  # [batch, layers, 2, kv_heads, s_alloc, qkv_dim]
    seq_len: int     # logical ring length (static)

    def tree_flatten(self):
        return [self.kv], self.seq_len

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    @property
    def batch(self) -> int:
        return self.kv.shape[0]

    @property
    def s_alloc(self) -> int:
        return self.kv.shape[4]

    @property
    def garbage_row(self) -> int:
        return self.seq_len  # first row past the ring

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
        s_alloc = round_up(seq_len + 1, 16)  # bf16 sublane tile
        kv = jnp.zeros(
            (batch, len(config.layer_configs), 2, lc.kv_heads, s_alloc,
             lc.qkv_dim),
            dtype,
        )
        return cls(kv, seq_len)

    def copy(self) -> "KVCache":
        """Deep copy for conversation forking (kv_cache.cc:49-55)."""
        return KVCache(jnp.array(self.kv), self.seq_len)

    def k_layer(self, layer_idx: int) -> jnp.ndarray:
        """[batch, kv_heads, s_alloc, qkv_dim] key panel."""
        return self.kv[:, layer_idx, 0]

    def v_layer(self, layer_idx: int) -> jnp.ndarray:
        return self.kv[:, layer_idx, 1]

    def update(
        self,
        layer_idx: int,
        positions: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        valid: jnp.ndarray | None = None,
    ) -> "KVCache":
        """Write k/v at ring positions (general/prefill path, XLA scatter).

        positions: [batch, tokens] absolute positions (mod applied here)
        k, v:      [batch, tokens, kv_heads, qkv_dim]
        valid:     [batch, tokens] bool; invalid slots go to the garbage row.

        The decode hot path (T == 1 on TPU) instead uses the in-place
        Pallas row write in ops/decode_attention.py.
        """
        rows = positions % self.seq_len
        if valid is not None:
            rows = jnp.where(valid, rows, self.garbage_row)
        # [B, T, H, D] -> [B, 2, H, T, D]
        kv_new = jnp.stack([k, v], axis=1).swapaxes(2, 3)

        def per_q(cache_q, rows_q, new_q):
            # cache_q: [2, H, S, D]; scatter new_q [2, H, T, D] along S.
            return cache_q.at[:, :, rows_q].set(new_q)

        updated = self.kv.at[:, layer_idx].set(
            jax.vmap(per_q)(self.kv[:, layer_idx], rows, kv_new)
        )
        return KVCache(updated, self.seq_len)
