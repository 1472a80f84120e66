"""Two-process jax.distributed smoke test for parallel/distributed.py.

Round-1 left initialize/global_mesh/sync_conf_mat untested beyond a
single process. Here the test launches TWO coordinator-connected CPU
processes (2 virtual devices each -> a 4-device global mesh), and checks:

- jax.distributed.initialize through our initialize() wrapper,
- is_global_zero() gating,
- global_mesh() spanning both processes,
- sync_conf_mat() summing across processes,
- a psum over the global mesh agreeing with the analytic value.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from hbird_tpu.parallel import distributed as D

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
D.initialize(coordinator_address=coord, num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc, jax.device_count()
assert D.is_global_zero() == (pid == 0)

mesh = D.global_mesh()
assert mesh.shape["data"] * mesh.shape["bank"] == 2 * nproc, dict(mesh.shape)

# Cross-process conf-mat sum: each process contributes pid+1 everywhere.
conf = np.full((3, 3), pid + 1, np.int64)
total = D.sync_conf_mat(conf)
expected = sum(range(1, nproc + 1))
assert (total == expected).all(), total

# psum over the global mesh: ones sharded over all devices.
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

n_dev = 2 * nproc
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(("data", "bank"))), np.ones((2,), np.float32),
    (n_dev,),
)
s = jax.jit(
    jax.shard_map(
        lambda x: jax.lax.psum(x.sum(), ("data", "bank")),
        mesh=mesh, in_specs=P(("data", "bank")), out_specs=P(),
        check_vma=False,
    )
)(arr)
assert float(np.asarray(s)) == float(n_dev), s

print(f"WORKER_{pid}_OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    nproc = 2
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(pid), str(nproc), coord],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((pid, p.returncode, out))
    for pid, rc, out in outs:
        assert rc == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_{pid}_OK" in out
