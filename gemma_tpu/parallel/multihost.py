"""Multi-host (DCN) initialization helpers.

Single-host meshes ride ICI only; for pod slices spanning hosts (the
BASELINE.md v5e-16 target) JAX needs distributed initialization before any
backend use, then the same ("data", "model") mesh spans all hosts —
`make_mesh` already builds from the global `jax.devices()` list.

Layout guidance (scaling-book recipe): keep the "model" (tensor) axis
within a host's ICI domain and put "data" across hosts, so per-layer psums
never cross DCN:

    init_distributed(coordinator, num_processes, process_id)
    mesh = make_mesh(config=config, data=num_hosts, model=chips_per_host)
"""

from __future__ import annotations

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper (env-var driven when args are
    None — works out of the box on Cloud TPU pod slices)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded batch dimension."""
    n = jax.process_count()
    pid = jax.process_index()
    per = global_batch // n
    return slice(pid * per, (pid + 1) * per)
