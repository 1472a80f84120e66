"""IVF-tree asymmetric-int8 check on TPU (round 5).

Validates the `quantization='int8_asym'` path through the TREE backend
on real hardware (the flat path is characterized in bench_backends.py):
bf16 queries scored against per-row int8 leaf slabs — the IVF Pallas
kernel casts each loaded slab tile to bf16 ahead of the MXU matmul
(`ops/ivf.py::_ivf_kernel`), row scales dequantize in the epilogue.

Clustered 1.024M x 768 bank (the geometry ViT patch embeddings have),
512 leaves, probe 32, k=30. Reports recall@30 vs the exact f32 oracle
and steady-state q/s/chip for int8_rows (symmetric) vs int8_asym, so
the asym benefit is measured on the same tree.

    python -u scripts/bench_asym_tree.py [--rows 1024000] [--probe 32]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_024_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--n-leaves", type=int, default=512)
    ap.add_argument("--n-clusters", type=int, default=256)
    ap.add_argument("--probe", type=int, default=32)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--queries", type=int, default=21904)  # 16 x 37^2
    ap.add_argument("--recall-sub", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
    from hbird_tpu.ops.knn import exact_knn

    print("device:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # Clustered unit-norm bank (same recipe as bench_ivf.py).
    centers = rng.normal(size=(args.n_clusters, args.d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    who = rng.integers(0, args.n_clusters, args.rows)
    noise = rng.normal(size=(args.rows, args.d)).astype(np.float32)
    noise *= 0.45 / np.linalg.norm(noise, axis=1, keepdims=True)
    bank = centers[who] + noise
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)

    # Bank-like queries (retrieval regime — where recall matters).
    src = rng.integers(0, args.rows, args.queries)
    q = bank[src] + 0.3 * rng.normal(size=(args.queries, args.d)).astype(
        np.float32
    )
    q = q.astype(np.float32)

    sub = args.recall_sub
    print("computing f32 oracle on recall subset...", flush=True)
    t0 = time.time()
    _, oracle_idx = exact_knn(
        jnp.asarray(q[:sub]), jnp.asarray(bank), args.k,
        query_block=4096, bank_block=32768,
    )
    oracle = np.asarray(oracle_idx)
    print(f"oracle done ({time.time()-t0:.1f}s)", flush=True)

    q_dev = jnp.asarray(q)
    common = dict(
        n_neighbors=args.k, use_tree=True, num_leaves=args.n_leaves,
        num_leaves_to_search=args.probe,
    )
    for tag, qz in (("int8_rows (sym)", "int8_rows"),
                    ("int8_asym     ", "int8_asym")):
        t0 = time.time()
        nn = NearestNeighborSearchApprox(bank, quantization=qz, **common)
        print(f"{tag}: tree built ({time.time()-t0:.1f}s)", flush=True)
        t0 = time.time()
        vals, idx, _ = nn.search_with_labels(q_dev, args.k)
        np.asarray(vals[:1])
        t_first = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            vals, idx, _ = nn.search_with_labels(q_dev, args.k)
            np.asarray(vals[:1])
        dt = (time.time() - t0) / args.iters
        # The backend maps tree hits back to original row ids itself.
        got = np.asarray(idx[:sub])
        recall = np.mean([
            len(set(got[i]) & set(oracle[i])) / args.k for i in range(sub)
        ])
        print(
            f"{tag}: {args.queries/dt:>9,.0f} q/s/chip  "
            f"recall@30={recall:.4f}  (first call {t_first:.1f}s)",
            flush=True,
        )
        del nn


if __name__ == "__main__":
    main()
