"""AOT-compile the round-3 parallel modes for a real v5e 2x4 topology.

CPU-mesh tests run Pallas kernels in interpret mode, so a Mosaic
lowering failure inside the SP/CP/PP shard_map bodies would only
surface when real multi-chip hardware runs them.  This script compiles
(without executing) each mode's step for an UNATTACHED v5e 2x4 topology
via jax.experimental.topologies — the same early-warning trick as
scripts/overlap_hlo.py — and prints collective/fusion op counts.

Run on the TPU host:  python scripts/aot_multichip.py
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


def _mesh8():
    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    return Mesh(np.asarray(topo.devices).reshape(1, 8), ("data", "model"))


def _sds(t):
    return jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t)


def _config():
    from __graft_entry__ import _toy_config

    # Lane-aligned dims so the Pallas GEMMs take their native path.
    return _toy_config(model_dim=256, heads=8, kv_heads=8, qkv_dim=128,
                       ff=1024, vocab=512, num_layers=8, seq=64)


def _counts(txt: str) -> str:
    c: dict = {}
    for m in re.finditer(
            r"(all-reduce|collective-permute|all-gather|fusion|"
            r"custom-call)\b", txt):
        c[m.group(1)] = c.get(m.group(1), 0) + 1
    return str(c)


def main() -> None:
    assert jax.default_backend() != "cpu", "needs the TPU toolchain"
    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.parallel import (build_cp_decode, build_pp_decode,
                                    build_sp_prefill, stack_layers)
    from gemma_tpu.utils.synth import synth_params

    mesh = _mesh8()
    config = _config()
    params = synth_params(config, kind="sfp", seed=0)
    batch, t = 8, 64
    ok = True

    sp = build_sp_prefill(config, mesh)
    txt = sp.lower(
        _sds(params), jax.ShapeDtypeStruct((batch, t), jnp.int32),
        jax.ShapeDtypeStruct((batch, t), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32)).compile().as_text()
    print(f"sp_prefill compiled: {_counts(txt)}")

    tok = jax.ShapeDtypeStruct((batch, 1), jnp.int32)
    cache = KVCache.create(config, batch, config.max_seq_len - 1,
                           kind="i8", split_local=False)
    step = build_cp_decode(config, mesh, cache)
    txt = step.lower(_sds(params), tok, tok, _sds(cache)).compile().as_text()
    print(f"cp_decode (i8 KV) compiled: {_counts(txt)}")

    pp_step = build_pp_decode(config, mesh, cache)
    # build_pp_decode wraps jit in a closure; reach the jitted fn by
    # tracing a call through jax.eval_shape instead of lower() — compile
    # via an explicit jit of the call.
    stacked = stack_layers(params)
    lowered = jax.jit(
        lambda s, e, f, a, p, c: pp_step(s, e, f, a, p, c)
    ).lower(_sds(stacked), _sds(params.embedding), _sds(params.final_norm),
            tok, tok, _sds(cache))
    txt = lowered.compile().as_text()
    print(f"pp_decode compiled: {_counts(txt)}")

    print("AOT MULTICHIP COMPILE OK")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
