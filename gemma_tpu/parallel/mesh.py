"""Device mesh construction (the BoundedTopology/NestedPools analog,
util/topology.h:84-155 — but over TPU chips instead of CPU clusters).

Axis convention, following the scaling-book recipe:
  "data"  — batch (query) parallelism; no weight traffic, DCN-friendly.
  "model" — tensor parallelism over heads / ffn / vocab; rides ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def pick_mesh_shape(n_devices: int, config=None,
                    max_model: int | None = None) -> tuple[int, int]:
    """Choose (data, model) sizes for n devices.

    Model-axis size is capped by head divisibility of the target config (TP
    shards whole KV heads; GQA groups stay intact) and defaults to putting
    as much as possible on the model axis — for inference, TP over ICI cuts
    per-chip weight traffic, which is the decode bottleneck.
    """
    cap = n_devices
    if max_model is not None:
        cap = min(cap, max_model)
    if config is not None:
        lc = config.layer_configs[0]
        for dim in (lc.heads, lc.kv_heads, lc.ff_hidden_dim):
            g = np.gcd(cap, dim)
            cap = int(g)
    model = 1
    while model * 2 <= cap and n_devices % (model * 2) == 0:
        model *= 2
    return n_devices // model, model


def make_mesh(n_devices: int | None = None, config=None,
              data: int | None = None, model: int | None = None) -> Mesh:
    """Build a ("data", "model") mesh over the first n devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if data is None or model is None:
        data, model = pick_mesh_shape(n_devices, config)
    assert data * model == n_devices, (data, model, n_devices)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))
