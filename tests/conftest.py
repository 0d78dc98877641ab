"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); the driver separately dry-runs the
multi-chip path and benches on a real TPU chip.

NOTE: this environment pins JAX_PLATFORMS=axon (remote TPU tunnel) via a
sitecustomize, so the env var alone is not enough -- we must also update
jax.config before the backend initializes, otherwise every test compile
goes over the tunnel.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
