"""KV cache (maps gemma/kv_cache.{h,cc}).

The reference keeps one 2-D ring buffer per query:
[seq_len, layers * kv_heads * qkv_dim * 2] with rows = pos % seq_len and
interleaved (k, v) pairs (kv_cache.h:28-57) — every layer gets the full
sequence length even when its attention window is tiny.

TPU-first redesign: up to two batched pool tensors

    kv:       [batch, n_global_layers, 2, kv_heads, s_alloc, qkv_dim]
    kv_local: [batch, n_local_layers, 2, kv_heads, s_alloc_local, qkv_dim]

in bf16 with [S, D] innermost, so one (batch, layer, k/v, head) slice is a
contiguous MXU-ready panel for the Pallas attention kernels.  Sliding-
window layers only ever attend to the last `window` positions
(attention.cc:167-170), so their rings are window + prefill_chunk rows —
for Gemma3 (5 of 6 layers at a 1024 window, 32K global) this shrinks the
cache ~8x and keeps local layers on the fast whole-panel decode kernel.
A uniform-window config degenerates to the single global pool.

Each pool's ring indexing (pos % pool_seq_len) matches the reference's
`div_seq_len.Remainder` wraparound (attention.cc:60-72); the mask
reconstruction from the newest position is ring-length-agnostic.  One
extra "garbage" row per pool absorbs writes from padded prefill slots.

KV_t is f32 in the reference but written via `Compress` which can narrow;
bf16 halves HBM traffic and cross-entropy parity is checked end-to-end.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gemma_tpu.models.configs import ModelConfig
from gemma_tpu.utils.basics import round_up

# Extra local-ring rows beyond the window so a prefill chunk's writes never
# clobber rows that earlier queries of the same chunk still attend to.
LOCAL_RING_SLACK = 256


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    kv: jnp.ndarray                 # global pool
    seq_len: int                    # global ring length (static)
    kv_local: jnp.ndarray | None = None
    seq_len_local: int = 0
    # layer_idx -> (is_local, index within its pool); static.
    layer_map: tuple = ()
    # Local-ring headroom beyond the largest local window: the maximum
    # prefill chunk size that cannot clobber still-needed rows in-chunk.
    local_slack: int = 0

    def tree_flatten(self):
        children = [self.kv] if self.kv_local is None else [self.kv, self.kv_local]
        aux = (self.seq_len, self.seq_len_local, self.layer_map,
               self.local_slack, self.kv_local is not None)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        seq_len, seq_len_local, layer_map, local_slack, has_local = aux
        kv_local = children[1] if has_local else None
        return cls(children[0], seq_len, kv_local, seq_len_local, layer_map,
                   local_slack)

    # --- pool routing ---

    def pool(self, layer_idx: int) -> tuple[jnp.ndarray, int, int]:
        """(pool tensor, index within pool, pool ring length)."""
        if not self.layer_map:
            return self.kv, layer_idx, self.seq_len
        is_local, idx = self.layer_map[layer_idx]
        if is_local:
            return self.kv_local, idx, self.seq_len_local
        return self.kv, idx, self.seq_len

    def seq_for_layer(self, layer_idx: int) -> int:
        return self.pool(layer_idx)[2]

    @property
    def batch(self) -> int:
        return self.kv.shape[0]

    @property
    def s_alloc(self) -> int:
        return self.kv.shape[4]

    @property
    def garbage_row(self) -> int:
        return self.seq_len  # first row past the global ring

    # --- construction ---

    @classmethod
    def create(
        cls,
        config: ModelConfig,
        batch: int,
        seq_len: int | None = None,
        dtype=jnp.bfloat16,
        split_local: bool = True,
        local_slack: int = LOCAL_RING_SLACK,
    ) -> "KVCache":
        lc = config.layer_configs[0]
        seq_len = min(seq_len or config.max_seq_len, config.max_seq_len)
        n_layers = len(config.layer_configs)

        windows = list(config.attention_window_sizes)
        local_windows = [w for w in windows if w < seq_len]
        use_local = (split_local and local_windows
                     and max(local_windows) + local_slack < seq_len)

        def alloc(n, ring):
            return jnp.zeros(
                (batch, n, 2, lc.kv_heads, round_up(ring + 1, 16),
                 lc.qkv_dim), dtype)

        if not use_local:
            return cls(alloc(n_layers, seq_len), seq_len)

        seq_local = max(local_windows) + local_slack
        layer_map = []
        gi = li = 0
        for w in windows:
            if w < seq_len:
                layer_map.append((True, li))
                li += 1
            else:
                layer_map.append((False, gi))
                gi += 1
        return cls(
            alloc(gi, seq_len), seq_len,
            alloc(li, seq_local), seq_local,
            tuple(layer_map), local_slack,
        )

    def copy(self) -> "KVCache":
        """Deep copy for conversation forking (kv_cache.cc:49-55)."""
        return KVCache(
            jnp.array(self.kv), self.seq_len,
            None if self.kv_local is None else jnp.array(self.kv_local),
            self.seq_len_local, self.layer_map, self.local_slack,
        )

    def assign(self, other: "KVCache") -> None:
        """Adopt another cache's buffers in place (host-side rebinding for
        caller-held conversation caches)."""
        self.kv = other.kv
        self.kv_local = other.kv_local

    def _replace_pool(self, layer_idx: int, pool: jnp.ndarray) -> "KVCache":
        if self.layer_map and self.layer_map[layer_idx][0]:
            return KVCache(self.kv, self.seq_len, pool, self.seq_len_local,
                           self.layer_map, self.local_slack)
        return KVCache(pool, self.seq_len, self.kv_local,
                       self.seq_len_local, self.layer_map, self.local_slack)

    # --- reads ---

    def k_layer(self, layer_idx: int) -> jnp.ndarray:
        """[batch, kv_heads, s_alloc, qkv_dim] key panel."""
        pool, idx, _ = self.pool(layer_idx)
        return pool[:, idx, 0]

    def v_layer(self, layer_idx: int) -> jnp.ndarray:
        pool, idx, _ = self.pool(layer_idx)
        return pool[:, idx, 1]

    # --- writes ---

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
        pool, idx, ring = self.pool(layer_idx)
        rows = positions % ring
        if valid is not None:
            rows = jnp.where(valid, rows, ring)  # pool garbage row
        # [B, T, H, D] -> [B, 2, H, T, D]
        kv_new = jnp.stack([k, v], axis=1).swapaxes(2, 3)

        def per_q(cache_q, rows_q, new_q):
            # cache_q: [2, H, S, D]; scatter new_q [2, H, T, D] along S.
            return cache_q.at[:, :, rows_q].set(new_q)

        updated = pool.at[:, idx].set(
            jax.vmap(per_q)(pool[:, idx], rows, kv_new)
        )
        return self._replace_pool(layer_idx, updated)
