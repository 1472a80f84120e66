"""Test configuration: force a virtual 8-device CPU mesh.

The environment's axon TPU shim forces jax_platforms="axon,cpu" via a
config update at jax import time (overriding JAX_PLATFORMS), so we must
re-update the config AFTER importing jax. Multi-chip sharding is validated
on virtual CPU devices, mirroring how the driver dry-runs the multi-chip
path.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
