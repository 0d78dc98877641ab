"""Multi-host (multi-process) smoke test over the DCN code path.

Real DCN needs a pod slice; this spawns TWO separate JAX processes (the
multi-controller model Cloud TPU pods use) on the CPU backend — 4 virtual
devices each — and drives the actual production path: `init_distributed`
-> global `make_mesh` (data axis ACROSS processes, model within, the
layout parallel/multihost.py prescribes) -> `build_tp_step` decode over
globally-sharded params/cache, asserting each process's logit rows match
a single-process reference forward (SURVEY §2.7 "multi-host DCN";
VERDICT r2 missing #3).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"]); sys.path.insert(0, os.environ["REPO"] + "/tests")

import numpy as np
import jax

from gemma_tpu.parallel.multihost import init_distributed, local_batch_slice

pid = int(sys.argv[1])
init_distributed(coordinator_address=os.environ["COORD"],
                 num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp
from jax.sharding import NamedSharding

from gemma_tpu.models.gemma import forward
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.parallel.mesh import make_mesh
from gemma_tpu.parallel.tp import CACHE_SPEC, build_tp_step, tp_layout
from tests.test_model import random_weights, to_params
from tests.test_parity_full import SEQ, gemma2_shaped_config

config = gemma2_shaped_config(num_layers=2)
rng = np.random.default_rng(7)
w = random_weights(config, rng)      # same seed -> identical on both hosts
params = to_params(w, config)

# data=2 spans the two processes; model=4 stays within each process's
# devices — per-layer psums never cross "DCN" (multihost.py layout).
mesh = make_mesh(config=config, data=2, model=4)
proc_of = {d: d.process_index for d in mesh.devices.flat}
assert len({proc_of[d] for d in mesh.devices[0]}) == 1, "model axis crosses hosts"
assert len({proc_of[mesh.devices[i, 0]] for i in range(2)}) == 2

def to_global(a, spec):
    s = NamedSharding(mesh, spec)
    a = np.asarray(a)
    return jax.make_array_from_callback(a.shape, s, lambda idx: a[idx])

specs = tp_layout(params, config, 4)
params_g = jax.tree.map(to_global, params, specs)

B, T = 4, 5
tokens = rng.integers(2, config.vocab_size, (B, T)).astype(np.int32)
cache_h = KVCache.create(config, B, SEQ)
cache_g = jax.tree.map(lambda a: to_global(a, CACHE_SPEC), cache_h)

from jax.sharding import PartitionSpec as P
prefill = build_tp_step(params_g, config, mesh, return_logits="none")
decode = build_tp_step(params_g, config, mesh, return_logits="last")

pos = np.tile(np.arange(T, dtype=np.int32), (B, 1))
valid = np.ones((B, T), bool)
pe = np.zeros((B,), np.int32)
data_spec = P("data", None)
cache_g = prefill(params_g,
                  to_global(tokens[:, :-1], data_spec),
                  to_global(pos[:, :-1], data_spec),
                  to_global(valid[:, :-1], data_spec),
                  to_global(pe, P("data")), cache_g)
logits, _ = decode(params_g,
                   to_global(tokens[:, -1:], data_spec),
                   to_global(pos[:, -1:], data_spec),
                   to_global(valid[:, -1:], data_spec),
                   to_global(pe, P("data")), cache_g)

# Single-process reference on the full batch (plain forward, no mesh).
ref_cache = KVCache.create(config, B, SEQ)
_, ref_cache = forward(params, jnp.asarray(tokens[:, :-1]),
                       jnp.asarray(pos[:, :-1]), ref_cache, config,
                       return_logits="none")
ref, _ = forward(params, jnp.asarray(tokens[:, -1:]),
                 jnp.asarray(pos[:, -1:]), ref_cache, config,
                 return_logits="last")
ref = np.asarray(ref)

sl = local_batch_slice(B)
for shard in logits.addressable_shards:
    row0 = shard.index[0].start or 0
    got = np.asarray(shard.data)
    want = ref[row0 : row0 + got.shape[0]]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
assert sl == slice(pid * 2, pid * 2 + 2), sl

# --- SP prefill with the ring axis SPANNING the two processes: the
# ppermute KV rotation crosses the "DCN" boundary every hop.  Layer-0 K
# is bit-strict vs the dense prefill cache (tests/test_sp.py rationale).
from gemma_tpu.parallel.sp import build_sp_prefill

mesh_sp = make_mesh(config=config, data=1, model=8)
assert len({proc_of[d] for d in mesh_sp.devices.flat}) == 2
T2 = 16
tokens2 = rng.integers(2, config.vocab_size, (B, T2)).astype(np.int32)
pos2 = np.tile(np.arange(T2, dtype=np.int32), (B, 1))

def to_global_sp(a, spec):
    s = NamedSharding(mesh_sp, spec)
    a = np.asarray(a)
    return jax.make_array_from_callback(a.shape, s, lambda idx: a[idx])

params_sp = jax.tree.map(lambda a: to_global_sp(a, P()), params)
sp = build_sp_prefill(config, mesh_sp, kv_dtype=jnp.float32)
x, ks, vs = sp(params_sp, to_global_sp(tokens2, P(None, "model")),
               to_global_sp(pos2, P(None, "model")),
               to_global_sp(np.zeros((B,), np.int32), P()))

ref_cache2 = KVCache.create(config, B, SEQ, kind="f32")
_, ref_cache2 = forward(params, jnp.asarray(tokens2), jnp.asarray(pos2),
                        ref_cache2, config, return_logits="none")
ref_k0 = np.asarray(ref_cache2.k_layer(0))[:, :, :T2]   # [B, KH, T2, D]
ref_k0 = ref_k0.transpose(0, 2, 1, 3)                   # [B, T2, KH, D]
for shard in ks.addressable_shards:
    tsl = shard.index[2]
    got = np.asarray(shard.data)[0]                     # layer 0
    np.testing.assert_allclose(got, ref_k0[:, tsl], rtol=1e-6, atol=1e-6)

print(f"proc {pid}: OK ({len(logits.addressable_shards)} local shards; "
      f"SP ring over DCN bit-strict at layer 0)")
"""


def test_two_process_dcn_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(
        os.environ,
        REPO=repo,
        COORD=f"127.0.0.1:{port}",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    env.pop("JAX_NUM_CPU_DEVICES", None)
    # A sitecustomize (e.g. the axon TPU-tunnel shim) that initializes a
    # JAX backend at interpreter start would pin process_count to 1
    # before init_distributed runs — keep it off the workers' path.
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i}: OK" in out
