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


TREE_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from hbird_tpu.parallel import distributed as D

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
D.initialize(coordinator_address=coord, num_processes=nproc, process_id=pid)

import jax.numpy as jnp
from hbird_tpu.ops.ivf import train_centroids, tree_layout
from hbird_tpu.parallel.mesh import make_mesh
from hbird_tpu.parallel.sharded_ivf import build_ivf_sharded, sharded_kmeans, shard_rows

mesh = make_mesh((2 * nproc,), ("bank",))

# Every process holds the same global host bank (engine convention).
rng = np.random.default_rng(7)
centers = rng.normal(size=(6, 16)).astype(np.float32) * 3
m = 402  # not divisible by 4: exercises the pad-row handling
x = centers[rng.integers(0, 6, m)] + 0.3 * rng.normal(size=(m, 16)).astype(np.float32)
x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
labels = rng.random((m, 3)).astype(np.float32)

n_leaves, cap = tree_layout(m, 4)
n_leaves = ((n_leaves + 2 * nproc - 1) // (2 * nproc)) * (2 * nproc)
cent = train_centroids(jnp.asarray(x), n_leaves, iters=5, key=jax.random.PRNGKey(0))
cent = np.asarray(cent)

# psum k-means across PROCESSES
x_s, m_real = shard_rows(x, mesh)
ref = np.asarray(
    sharded_kmeans(x_s, jnp.asarray(cent), mesh, iters=3, valid_rows=m_real)
)
assert np.isfinite(ref).all()

parts = build_ivf_sharded(x, labels, jnp.asarray(cent), n_leaves, cap, mesh)
assert parts["valid_rows"] == m
assert parts["leaf_fill"].sum() == m, parts["leaf_fill"]
assert parts["perm"].max() == m - 1

# Check the ADDRESSABLE shards' content against the host layout.
slots = parts["slots"]
bank_g = parts["ivf_bank"]
for shard in bank_g.addressable_shards:
    start = shard.index[0].start or 0
    local = np.asarray(shard.data)
    for s_local in range(local.shape[0]):
        g = start + s_local
        row = np.where(slots == g)[0]
        if row.size:
            np.testing.assert_allclose(local[s_local], x[row[0]], rtol=1e-6)

# Built-tree persistence across processes: each process writes ONLY its
# addressable slab shards, process 0 writes manifests/meta, barriers
# order the phases; the reload places shards back without any host ever
# holding a non-addressable row.
treedir = sys.argv[4]
from hbird_tpu.bank.io import load_tree_state, save_tree_state

save_tree_state(
    treedir, ivf_bank=bank_g, ivf_labels=parts["ivf_labels"],
    centroids=parts["centroids"], leaf_valid=parts["leaf_fill"],
    perm=parts["perm"], slots=slots, cap=cap, valid_rows=m,
)
st = load_tree_state(treedir, mesh=mesh)
assert st["cap"] == cap and st["valid_rows"] == m
np.testing.assert_array_equal(np.asarray(st["perm"]), np.asarray(parts["perm"]))
np.testing.assert_allclose(
    np.asarray(st["centroids"]), np.asarray(parts["centroids"]), rtol=1e-6
)
old_by_start = {
    (sh.index[0].start or 0): np.asarray(sh.data)
    for sh in bank_g.addressable_shards if sh.replica_id == 0
}
for sh in st["ivf_bank"].addressable_shards:
    if sh.replica_id != 0:
        continue
    start = sh.index[0].start or 0
    assert start in old_by_start, (start, sorted(old_by_start))
    np.testing.assert_allclose(
        np.asarray(sh.data), old_by_start[start], rtol=1e-6
    )
print(f"TREE_WORKER_{pid}_OK", flush=True)
"""


def test_two_process_tree_build(tmp_path):
    """The distributed IVF tree build runs across REAL processes: psum
    k-means, replicated assignment, ppermute ring scatter — every step
    multi-host-safe (global arrays via make_array_from_callback)."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    nproc = 2
    script = tmp_path / "tree_worker.py"
    script.write_text(TREE_WORKER)
    treedir = str(tmp_path / "shared.treedir")
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(pid), str(nproc), coord,
                 treedir],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((pid, p.returncode, out))
    for pid, rc, out in outs:
        assert rc == 0, f"tree worker {pid} failed:\n{out[-3000:]}"
        assert f"TREE_WORKER_{pid}_OK" in out


RING4_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from hbird_tpu.parallel import distributed as D

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
D.initialize(coordinator_address=coord, num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
n_dev = jax.device_count()

import jax.numpy as jnp
from hbird_tpu.parallel.mesh import make_mesh
from hbird_tpu.parallel.sharded_knn import ring_knn_with_labels, shard_bank

mesh = make_mesh((n_dev,), ("bank",))

# Engine convention: every process holds the same global host data.
rng = np.random.default_rng(21)
m, d, nc, k = 512, 16, 3, 7
bank = rng.normal(size=(m, d)).astype(np.float32)
bank /= np.linalg.norm(bank, axis=1, keepdims=True)
labels = rng.random((m, nc)).astype(np.float32)
q = rng.normal(size=(64, d)).astype(np.float32)

# --- ring strategy across 4 REAL processes (VERDICT r3 item 7) ---
bank_s, labels_s, valid = shard_bank(bank, labels, mesh)
vals, idx, labs = ring_knn_with_labels(
    jnp.asarray(q), bank_s, labels_s, k, mesh=mesh, valid_rows=valid,
)
# Ring outputs are query-sharded over the GLOBAL mesh: fetch via
# allgather (plain np.asarray refuses arrays spanning other processes).
from jax.experimental import multihost_utils as MH
vals = np.asarray(MH.process_allgather(vals, tiled=True))
idx = np.asarray(MH.process_allgather(idx, tiled=True))
labs = np.asarray(MH.process_allgather(labs, tiled=True))
exact = q @ bank.T
exact_idx = np.argsort(-exact, axis=1, kind="stable")[:, :k]
exact_vals = np.take_along_axis(exact, exact_idx, axis=1)
np.testing.assert_allclose(vals, exact_vals, atol=1e-4)
same = idx == exact_idx
tied = np.isclose(vals, exact_vals)
assert (same | tied).all()
np.testing.assert_allclose(
    labs.reshape(-1, nc), labels[idx.reshape(-1)], atol=1e-5
)
print(f"RING4_{pid}_RING_OK", flush=True)

# --- device-layout tree build + search + treedir round-trip ---
from hbird_tpu.ops.ivf import train_centroids, tree_layout
from hbird_tpu.parallel.sharded_ivf import (
    build_ivf_sharded, sharded_ivf_knn_with_labels,
)

n_leaves, cap = tree_layout(m, n_dev)
n_leaves = ((n_leaves + n_dev - 1) // n_dev) * n_dev
cent = train_centroids(jnp.asarray(bank), n_leaves, iters=4,
                       key=jax.random.PRNGKey(1))
parts = build_ivf_sharded(
    bank, labels, cent, n_leaves, cap, mesh, layout="device",
)
assert parts["valid_rows"] == m
tvals, tidx, tlabs = sharded_ivf_knn_with_labels(
    jnp.asarray(q), parts["ivf_bank"], parts["ivf_labels"],
    parts["centroids"], jnp.asarray(parts["leaf_fill"], jnp.int32), k,
    mesh=mesh, cap=cap, n_probe=n_leaves, block_q=64,
)
# Full probe (n_probe == n_leaves) must recover the exact neighbours.
tvals = np.asarray(MH.process_allgather(tvals, tiled=True))
np.testing.assert_allclose(np.sort(tvals, 1), np.sort(exact_vals, 1),
                           atol=1e-4)
print(f"RING4_{pid}_TREE_OK", flush=True)

# --- multi-process .treedir save/load at 4 processes ---
treedir = sys.argv[4]
from hbird_tpu.bank.io import load_tree_state, save_tree_state

save_tree_state(
    treedir, ivf_bank=parts["ivf_bank"], ivf_labels=parts["ivf_labels"],
    centroids=parts["centroids"], leaf_valid=parts["leaf_fill"],
    perm=parts["perm"], slots=parts["slots"], cap=cap, valid_rows=m,
)
st = load_tree_state(treedir, mesh=mesh)
assert st["cap"] == cap and st["valid_rows"] == m
for name in ("ivf_bank", "ivf_labels"):
    old = {
        (sh.index[0].start or 0): np.asarray(sh.data)
        for sh in parts[name].addressable_shards if sh.replica_id == 0
    }
    for sh in st[name].addressable_shards:
        if sh.replica_id != 0:
            continue
        start = sh.index[0].start or 0
        np.testing.assert_array_equal(np.asarray(sh.data), old[start])
print(f"RING4_{pid}_OK", flush=True)
"""


ENGINE_WORKER = r"""
import os, sys
import random
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
root = sys.argv[4]; val_fs = sys.argv[5]

if nproc > 1:
    from hbird_tpu.parallel import distributed as D
    D.initialize(coordinator_address=coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

# Identical augmentation stream across the single- and multi-process runs
# (train transforms draw from the stdlib global RNG) -> identical banks.
random.seed(1234)
np.random.seed(1234)

from hbird_tpu import hbird_evaluation

PATCH = 4

def oracle_fn(model, imgs):
    b, c, h, w = imgs.shape
    s = h // PATCH
    x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
    return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

miou = hbird_evaluation(
    model=None, ftr_extr_fn=oracle_fn, d_model=3, patch_size=PATCH,
    dataset_name="voc", data_dir=root, batch_size=2, input_size=32,
    augmentation_epoch=1, n_neighbours=5, nn_method="exact",
    num_workers=0, val_fs_path=val_fs,
)
print(f"ENGINE_{pid}_MIOU={float(miou):.12f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_engine_e2e(tmp_path):
    """`hbird_evaluation` ITSELF runs across 2 coordinator-connected
    processes (VERDICT r4 item 2): each process builds the (identical)
    memory bank from the full train split, evaluates its OWN half of the
    val split, and `PredsmIoU.compute(sync_distributed=True)` allgather-
    sums the confusion matrices — the working version of the reference's
    dormant DDP all_reduce hook (eval_metrics.py:250-252) at the engine
    level. Both ranks must report mIoU EQUAL to a single-process run over
    the full val split (conf-mats are integer counts and per-image
    predictions are batch-independent, so equality is exact)."""
    from hbird_tpu.data.synthetic import make_voc_fixture

    root = str(tmp_path / "voc")
    make_voc_fixture(
        root, n_train=12, n_val=6, size=(64, 48), colorize=True, seed=3,
        class_pool=[1, 2, 3, 4, 5],
    )
    nproc = 2
    val_ids = [f"val_{i:04d}" for i in range(6)]
    fs_paths = []
    for pid in range(nproc):
        p = tmp_path / f"val_shard_{pid}.txt"
        p.write_text("\n".join(val_ids[pid::nproc]))
        fs_paths.append(str(p))
    full_fs = tmp_path / "val_full.txt"
    full_fs.write_text("\n".join(val_ids))

    script = tmp_path / "engine_worker.py"
    script.write_text(ENGINE_WORKER)

    def run(pid, nproc, coord, val_fs):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        return subprocess.Popen(
            [sys.executable, str(script), str(pid), str(nproc), coord, root,
             val_fs],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )

    # Single-process oracle over the full val split.
    p = run(0, 1, "unused", str(full_fs))
    out, _ = p.communicate(timeout=420)
    assert p.returncode == 0, f"single-process oracle failed:\n{out[-3000:]}"
    oracle = [l for l in out.splitlines() if l.startswith("ENGINE_0_MIOU=")]
    assert oracle, out[-2000:]
    oracle_miou = float(oracle[0].split("=")[1])

    # Two coordinator-connected processes, each scoring its val shard.
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = [run(pid, nproc, coord, fs_paths[pid]) for pid in range(nproc)]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((pid, p.returncode, out))
    for pid, rc, out in outs:
        assert rc == 0, f"engine worker {pid} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines()
                if l.startswith(f"ENGINE_{pid}_MIOU=")]
        assert line, out[-2000:]
        got = float(line[0].split("=")[1])
        assert got == pytest.approx(oracle_miou, abs=1e-9), (
            pid, got, oracle_miou,
        )


@pytest.mark.slow
def test_four_process_ring_and_device_tree(tmp_path):
    """4 coordinator-connected processes x 2 virtual devices = an 8-device
    mesh spanning processes: ring-strategy exact search,
    tree_build_layout='device' IVF build + meshed search, and 4-process
    .treedir save/load (VERDICT r3 item 7)."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    nproc = 4
    script = tmp_path / "ring4_worker.py"
    script.write_text(RING4_WORKER)
    treedir = str(tmp_path / "shared4.treedir")
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(pid), str(nproc), coord,
                 treedir],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((pid, p.returncode, out))
    for pid, rc, out in outs:
        assert rc == 0, f"ring4 worker {pid} failed:\n{out[-3000:]}"
        assert f"RING4_{pid}_OK" in out
