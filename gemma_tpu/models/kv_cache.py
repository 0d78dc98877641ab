"""KV cache (maps gemma/kv_cache.{h,cc}).

The reference keeps one 2-D ring buffer per query:
[seq_len, layers * kv_heads * qkv_dim * 2] with rows = pos % seq_len and
interleaved (k, v) pairs (kv_cache.h:28-57) — every layer gets the full
sequence length even when its attention window is tiny.

TPU-first redesign: up to two batched pool tensors

    kv:       [batch, n_global_layers, 2, kv_heads, s_alloc, qkv_dim]
    kv_local: [batch, n_local_layers, 2, kv_heads, s_alloc_local, qkv_dim]

with [S, D] innermost, so one (batch, layer, k/v, head) slice is a
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
bf16 (default) halves HBM traffic, and kind="i8" halves it again with
symmetric per-(position, head) scales in shadow arrays

    kv_scale:  [batch, n_layers, 2, kv_heads, 1, s_alloc]  f32
(rank-6 like the pools so one PartitionSpec covers every leaf on a mesh)

that the attention kernels apply to their *outputs* (never dequantizing
the [S, D] panels element-wise — see ops/kv_quant.py).  Cross-entropy
drift per KV dtype is bounded by tests/test_parity_full.py.
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
    # Per-(b, layer, k/v, head, row) f32 scales; present iff kind == "i8".
    kv_scale: jnp.ndarray | None = None
    kv_local_scale: jnp.ndarray | None = None

    def tree_flatten(self):
        children = [self.kv, self.kv_local, self.kv_scale,
                    self.kv_local_scale]
        present = tuple(c is not None for c in children)
        aux = (self.seq_len, self.seq_len_local, self.layer_map,
               self.local_slack, present)
        return [c for c in children if c is not None], aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        seq_len, seq_len_local, layer_map, local_slack, present = aux
        it = iter(children)
        kv, kv_local, kv_scale, kv_local_scale = (
            next(it) if p else None for p in present)
        return cls(kv, seq_len, kv_local, seq_len_local, layer_map,
                   local_slack, kv_scale, kv_local_scale)

    # --- pool routing ---

    @property
    def quantized(self) -> bool:
        return self.kv_scale is not None

    def pool(self, layer_idx: int) -> tuple[jnp.ndarray, int, int]:
        """(pool tensor, index within pool, pool ring length)."""
        if not self.layer_map:
            return self.kv, layer_idx, self.seq_len
        is_local, idx = self.layer_map[layer_idx]
        if is_local:
            return self.kv_local, idx, self.seq_len_local
        return self.kv, idx, self.seq_len

    def pool_scale(self, layer_idx: int) -> jnp.ndarray | None:
        """The scale array shadowing pool(layer_idx), or None."""
        if self.kv_scale is None:
            return None
        if self.layer_map and self.layer_map[layer_idx][0]:
            return self.kv_local_scale
        return self.kv_scale

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
        kind: str | None = None,
    ) -> "KVCache":
        """kind: "bf16" (default), "f32", or "i8" (quantized, shadow
        scales); `dtype` is the legacy spelling of the non-quantized kinds.
        """
        if kind is not None:
            dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32,
                     "i8": jnp.int8}[kind]
        quant = dtype == jnp.int8
        lc = config.layer_configs[0]
        seq_len = min(seq_len or config.max_seq_len, config.max_seq_len)
        n_layers = len(config.layer_configs)

        windows = list(config.attention_window_sizes)
        local_windows = [w for w in windows if w < seq_len]
        use_local = (split_local and local_windows
                     and max(local_windows) + local_slack < seq_len)

        # Ring + 1 garbage row, padded to the dtype's sublane tile (16 for
        # bf16, 32 for i8) so the in-place row-write kernel's tiles never
        # cross the array bound.  (A 128-row pad would give the opt-in
        # S-blocked decode kernel lane-legal splits on quantized pools,
        # but that kernel measured 15x SLOWER than the one-shot panel on
        # v5e — docs/PERF.md — and the extra rows cost ~2% decode, so the
        # tight pad stays.)
        tile = 32 if quant else 16

        def alloc(n, ring):
            return jnp.zeros(
                (batch, n, 2, lc.kv_heads, round_up(ring + 1, tile),
                 lc.qkv_dim), dtype)

        def alloc_scale(n, ring):
            if not quant:
                return None
            return jnp.zeros(
                (batch, n, 2, lc.kv_heads, 1, round_up(ring + 1, tile)),
                jnp.float32)

        if not use_local:
            return cls(alloc(n_layers, seq_len), seq_len,
                       kv_scale=alloc_scale(n_layers, seq_len))

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
            alloc_scale(gi, seq_len), alloc_scale(li, seq_local),
        )

    def copy(self) -> "KVCache":
        """Deep copy for conversation forking (kv_cache.cc:49-55)."""
        cp = lambda a: None if a is None else jnp.array(a)
        return KVCache(
            jnp.array(self.kv), self.seq_len, cp(self.kv_local),
            self.seq_len_local, self.layer_map, self.local_slack,
            cp(self.kv_scale), cp(self.kv_local_scale),
        )

    def assign(self, other: "KVCache") -> None:
        """Adopt another cache's buffers in place (host-side rebinding for
        caller-held conversation caches)."""
        self.kv = other.kv
        self.kv_local = other.kv_local
        self.kv_scale = other.kv_scale
        self.kv_local_scale = other.kv_local_scale

    def _replace_pool(self, layer_idx: int, pool: jnp.ndarray,
                      scale: jnp.ndarray | None = None) -> "KVCache":
        new = dataclasses.replace(self)
        if self.layer_map and self.layer_map[layer_idx][0]:
            new.kv_local = pool
            if scale is not None:
                new.kv_local_scale = scale
        else:
            new.kv = pool
            if scale is not None:
                new.kv_scale = scale
        return new

    # --- reads ---

    def k_layer(self, layer_idx: int) -> jnp.ndarray:
        """[batch, kv_heads, s_alloc, qkv_dim] key panel (dequantized when
        the cache is i8 — fallback/test path; kernels use raw codes)."""
        pool, idx, _ = self.pool(layer_idx)
        if not self.quantized:
            return pool[:, idx, 0]
        from gemma_tpu.ops.kv_quant import dequantize_rows

        return dequantize_rows(pool[:, idx, 0],
                               self.pool_scale(layer_idx)[:, idx, 0, :, 0])

    def v_layer(self, layer_idx: int) -> jnp.ndarray:
        pool, idx, _ = self.pool(layer_idx)
        if not self.quantized:
            return pool[:, idx, 1]
        from gemma_tpu.ops.kv_quant import dequantize_rows

        return dequantize_rows(pool[:, idx, 1],
                               self.pool_scale(layer_idx)[:, idx, 1, :, 0])

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

        if self.quantized:
            from gemma_tpu.ops.kv_quant import quantize_rows

            codes, scale = quantize_rows(kv_new)  # [B,2,H,T,D], [B,2,H,T]
            scales_arr = self.pool_scale(layer_idx)

            def per_q_s(sc_q, rows_q, new_q):
                # sc_q: [2, H, 1, S]; scatter new_q [2, H, T] along S.
                return sc_q.at[:, :, 0, rows_q].set(new_q)

            new_scales = scales_arr.at[:, idx].set(
                jax.vmap(per_q_s)(scales_arr[:, idx], rows, scale))
            kv_new = codes
        else:
            new_scales = None

        def per_q(cache_q, rows_q, new_q):
            # cache_q: [2, H, S, D]; scatter new_q [2, H, T, D] along S.
            return cache_q.at[:, :, rows_q].set(new_q)

        updated = pool.at[:, idx].set(
            jax.vmap(per_q)(pool[:, idx], rows,
                            kv_new.astype(pool.dtype))
        )
        return self._replace_pool(layer_idx, updated, new_scales)
