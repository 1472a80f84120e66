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

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Fast/slow tiers. The fast tier (`pytest -m "not slow"`) is the inner-loop
# check (~2 min on the 1-core dev host) and still touches every layer:
# core math, both Pallas kernels, data, metrics, models, engine smoke.
# The slow tier holds the mesh/persistence/distributed/calibration and
# golden-e2e suites (measured per-file durations, round 4).
# ---------------------------------------------------------------------------
SLOW_MODULES = {
    "test_sharded_ivf_build",  # 723s: device-layout builds on 8-dev CPU mesh
    "test_tree_persistence",  # 253s: treedir roundtrips + meshed loads
    "test_ivf",  # 281s: probe calibration + meshed tree search
    "test_engine",  # 91s: synthetic end-to-end engine matrix
    "test_graft_entry",  # 88s: subprocess dryrun_multichip
    "test_ring_knn",  # 66s: ring strategy vs oracle on the mesh
    "test_advice_fixes",  # 66s: shard-probe semantics sweeps
    "test_distributed_smoke",  # multi-process coordinator runs
    "test_parallel",  # 39s: sharded kNN matrices
    "test_aot_eval",  # 24s: AOT precompile paths
    "test_reference_golden_e2e",  # 22s: reference engine fixtures
    "test_dinov2_oracle",  # 71s: torch/transformers forwards
    "test_torch_backbone",  # 92s: live-torch engine runs
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy tier (mesh/persistence/golden-e2e); "
        'deselect with -m "not slow"'
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.purebasename in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
