"""Regression test for the driver's multi-chip gate.

Round 1 failed the driver gate because ``dryrun_multichip`` ran in-process
and JAX initialized on the (broken) axon TPU platform.  It now re-execs in
a scrubbed CPU subprocess; this test calls it the way the driver does —
direct import + call, with the hostile JAX_PLATFORMS=axon env intact —
and asserts success.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_survives_hostile_env():
    # Run in a fresh process that mimics the driver: default env (axon
    # platform forced by sitecustomize), jax imported first, then a direct
    # call to dryrun_multichip.
    env = dict(os.environ)
    env.pop("HBIRD_DRYRUN_INPROC", None)
    env["JAX_PLATFORMS"] = "axon"  # hostile: TPU platform requested
    # Clear the conftest's CPU forcing so the outer process really does
    # resemble the driver.
    env.pop("XLA_FLAGS", None)
    code = (
        "import __graft_entry__; __graft_entry__.dryrun_multichip(4); "
        "print('DRIVER_GATE_OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "DRIVER_GATE_OK" in proc.stdout
    assert "dryrun_multichip OK" in proc.stdout
