"""Multi-chip parallelism (replaces util/threading* — SURVEY.md §2.7).

The reference scales with a two-level thread-pool hierarchy over CCX
clusters and shared memory (util/threading.h:87-183).  The TPU-native
equivalent here is a `jax.sharding.Mesh` over ICI with explicit
`shard_map` + collectives:

  - `mesh.py`:  device mesh construction ("data" × "model" axes).
  - `tp.py`:    Megatron-style tensor parallelism for the transformer —
                weights row/col-sharded over the "model" axis, two psums per
                layer, vocab-sharded embedding; batch sharded over "data".
  - `ring_attention.py`: sequence-parallel blockwise attention — KV
                shards rotate around the ICI ring on `ppermute` while
                each chip folds the resident block into an online
                softmax (long-context prefill past one chip's HBM).
  - `sp.py`:    sequence-parallel prefill — the full layer stack with T
                sharded over the mesh (weights replicated, ring
                attention the only communication).
  - `cp.py`:    context-parallel decode — global KV pools sharded over
                the ring dim, partial-softmax attention merged with
                pmax/psum, masked owner-shard row writes.
  - `pp.py`:    pipeline-parallel decode — stacked layer weights and the
                cache's layer dim sharded into stages; microbatched
                hidden states hop on one ppermute per stage boundary
                (the DCN-friendly axis: communication independent of
                layer count).
"""

from gemma_tpu.parallel.cp import (build_cp_decode,
                                   build_cp_decode_chunk,
                                   shard_cache_cp)
from gemma_tpu.parallel.pp import (build_pp_decode,
                                   build_pp_decode_chunk,
                                   shard_cache_pp, stack_layers)
from gemma_tpu.parallel.mesh import make_mesh, pick_mesh_shape
from gemma_tpu.parallel.ring_attention import build_ring_attention
from gemma_tpu.parallel.sp import build_sp_prefill, scatter_into_cache
from gemma_tpu.parallel.tp import (
    build_tp_decode_chunk,
    build_tp_step,
    shard_cache,
    shard_params,
    tp_layout,
)

__all__ = [
    "build_ring_attention",
    "build_sp_prefill",
    "scatter_into_cache",
    "build_cp_decode",
    "build_cp_decode_chunk",
    "shard_cache_cp",
    "build_pp_decode",
    "build_pp_decode_chunk",
    "shard_cache_pp",
    "stack_layers",
    "make_mesh",
    "pick_mesh_shape",
    "build_tp_decode_chunk",
    "build_tp_step",
    "shard_params",
    "shard_cache",
    "tp_layout",
]
