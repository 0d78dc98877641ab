"""Structural proof (or refutation) of collective/compute overlap.

Compiles the TP prefill step for an UNATTACHED v5e 2x4 topology (AOT,
jax.experimental.topologies — no multi-chip hardware needed) and inspects
the scheduled TPU HLO (VERDICT r2 weak #6; BASELINE.md's >=85% scaling
target assumes overlapped collectives):

  mode=psum (default): `jax.lax.psum` lowers to a SYNCHRONOUS all-reduce
    and XLA's combiner coalesces the 4 chunked psums back into ONE tupled
    all-reduce — the chunked-psum overlap idea never overlapped anything.
  mode=ring (`build_tp_step(ring_reduce=True)`): every hop is a
    `ppermute`, which compiles to async collective-permute-start/done
    pairs, and the scheduler interleaves independent fusions (other
    chunks' matmuls) between start and done — real overlap, in the
    schedule, on the real TPU compiler.

Run on the TPU host:  python scripts/overlap_hlo.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import Mesh


def compile_step(ring: bool) -> str:
    from __graft_entry__ import _toy_config
    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.parallel import build_tp_step
    from gemma_tpu.utils.synth import synth_params

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    mesh = Mesh(np.asarray(topo.devices).reshape(1, 8), ("data", "model"))
    config = _toy_config(model_dim=256, heads=8, kv_heads=8, qkv_dim=128,
                         ff=1024, vocab=512)
    params = synth_params(config, kind="sfp", seed=0, fuse_qkv=False)
    cache = KVCache.create(config, 8, 64)
    step = build_tp_step(params, config, mesh, return_logits="none",
                         overlap_chunks=4, ring_reduce=ring)

    def sds(t):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t)

    lowered = step.lower(
        sds(params), jax.ShapeDtypeStruct((8, 8), jnp.int32),
        jax.ShapeDtypeStruct((8, 8), jnp.int32),
        jax.ShapeDtypeStruct((8, 8), bool),
        jax.ShapeDtypeStruct((8,), jnp.int32), sds(cache))
    return lowered.compile().as_text()


def analyze(txt: str) -> dict:
    counts: dict = {}
    for m in re.finditer(
            r"(all-reduce-start|all-reduce|collective-permute-start|"
            r"collective-permute-done|collective-permute)\b", txt):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    # Overlap evidence: compute ops scheduled BETWEEN a start and its done.
    overlapped = 0
    windows = 0
    lines = txt.splitlines()
    open_since: dict = {}
    for ln in lines:
        mstart = re.search(r"%(collective-permute-start[.\d]*) =", ln)
        mdone = re.search(r"collective-permute-done[.\d]* = \S+ "
                          r"collective-permute-done\(%"
                          r"(collective-permute-start[.\d]*)\)", ln)
        if mstart:
            open_since[mstart.group(1)] = 0
        elif mdone:
            name = mdone.group(1)
            windows += 1
            if open_since.pop(name, 0) > 0:
                overlapped += 1
        elif open_since and re.search(r"(fusion|convolution|custom-call)",
                                      ln):
            for k in open_since:
                open_since[k] += 1
    counts["_windows"] = windows
    counts["_windows_with_compute_inside"] = overlapped
    return counts


def main() -> None:
    assert jax.default_backend() != "cpu", "needs the TPU toolchain"
    print("mode=psum (default, bit-exact):")
    a = analyze(compile_step(ring=False))
    print(f"  {a}")
    sync_ar = a.get("all-reduce", 0)
    print(f"  -> {sync_ar} SYNCHRONOUS all-reduce ops, "
          f"{a.get('all-reduce-start', 0)} async; chunked psums were "
          f"combined — no overlap possible.")

    print("mode=ring (build_tp_step(ring_reduce=True)):")
    b = analyze(compile_step(ring=True))
    print(f"  {b}")
    w, ov = b["_windows"], b["_windows_with_compute_inside"]
    print(f"  -> {w} async collective-permute windows, {ov} with "
          f"independent compute scheduled INSIDE (true overlap).")
    ok = b.get("collective-permute-start", 0) > 0 and ov > 0
    print("OVERLAP STRUCTURALLY PROVEN" if ok else "NO OVERLAP FOUND")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
