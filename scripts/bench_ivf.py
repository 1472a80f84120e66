"""IVF backend characterization on TPU: recall + q/s vs the exact kernel.

Production-geometry run: 1.024M-row x 768 bf16 bank (mixture of semantic
clusters — the geometry patch embeddings actually have), 512 leaves,
ViT-B/14@518-shaped query batches, k=30. Sweeps n_probe and reports
recall@30 vs the exact f32 oracle and steady-state queries/s/chip.

    python scripts/bench_ivf.py [--rows 1024000] [--n-leaves 512]
        [--probes 8 16 32 64] [--int8]
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
    ap.add_argument("--probes", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--queries", type=int, default=21904)  # 16 x 37^2
    ap.add_argument("--block-q", type=int, default=256)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--refine", type=int, default=2)
    args = ap.parse_args()

    from hbird_tpu.ops.ivf import (
        assign_leaves,
        balanced_layout,
        build_ivf_arrays,
        ivf_search,
        train_centroids,
        tree_layout,
    )
    from hbird_tpu.ops.knn_pallas import pallas_knn

    print("device:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # Clustered unit-norm bank (mixture = what ViT patch embeddings look
    # like; IVF on an unclustered bank is meaningless).
    t0 = time.time()
    centers = rng.normal(size=(args.n_clusters, args.d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    who = rng.integers(0, args.n_clusters, args.rows)
    # NORM-RELATIVE noise: ||noise|| ~ 0.45 vs unit centers, so cluster
    # structure survives in 768-d (per-dim noise would swamp the signal
    # and make the bank uniform — recall would just equal the scanned
    # fraction, testing nothing).
    noise = rng.normal(size=(args.rows, args.d)).astype(np.float32)
    noise *= 0.45 / np.linalg.norm(noise, axis=1, keepdims=True)
    x = centers[who] + noise
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    # queries: perturbed bank rows (near-duplicate retrieval regime)
    qsel = rng.integers(0, args.rows, args.queries)
    qn = rng.normal(size=(args.queries, args.d)).astype(np.float32)
    qn *= 0.2 / np.linalg.norm(qn, axis=1, keepdims=True)
    q = x[qsel] + qn
    print(f"data built ({time.time()-t0:.1f}s)", flush=True)

    store = jnp.int8 if args.int8 else jnp.bfloat16
    if args.int8:
        scale = float(np.abs(x).max() / 127.0)
        bank_dev = jnp.asarray(
            np.clip(np.round(x / scale), -127, 127).astype(np.int8)
        )
        q_scale = float(np.abs(q).max() / 127.0)
        q_dev = jnp.asarray(
            np.clip(np.round(q / q_scale), -127, 127).astype(np.int8)
        )
    else:
        bank_dev = jnp.asarray(x, jnp.bfloat16)
        q_dev = jnp.asarray(q, jnp.bfloat16)

    # ---- IVF build --------------------------------------------------
    t0 = time.time()
    n_leaves, cap = tree_layout(args.rows, args.n_leaves)
    sample_idx = rng.choice(args.rows, min(args.rows, 131072), replace=False)
    sample = jnp.asarray(x[sample_idx])
    cent = train_centroids(
        sample, n_leaves, iters=12, key=jax.random.PRNGKey(1),
    )
    if args.refine > 0:
        from hbird_tpu.ops.ivf import refine_centroids_balanced

        cent = refine_centroids_balanced(
            sample, cent, slack=1.3, rounds=args.refine
        )
    cent.block_until_ready()
    t_km = time.time() - t0
    # Assign from the DEVICE-resident bank (the f32 host copy would cost
    # bank-bytes of tunnel bandwidth again).
    t0 = time.time()
    choices = assign_leaves(bank_dev, cent, n_choices=3)
    t_assign = time.time() - t0
    t0 = time.time()
    slots, fill = balanced_layout(choices, n_leaves, cap)
    t_bal = time.time() - t0
    t0 = time.time()
    ivf_bank, _, perm = build_ivf_arrays(bank_dev, None, slots, n_leaves, cap)
    ivf_bank.block_until_ready()
    leaf_valid = jnp.asarray(fill, jnp.int32)
    t_scatter = time.time() - t0
    spilled = int((choices[:, 0] != (np.asarray(slots) // cap)).sum())
    print(
        f"IVF build: kmeans {t_km:.1f}s, assign {t_assign:.1f}s, "
        f"balance {t_bal:.1f}s, scatter {t_scatter:.1f}s; "
        f"{n_leaves} leaves x cap {cap} "
        f"(pad {n_leaves*cap/args.rows-1:+.0%}), "
        f"{spilled/args.rows:.1%} rows off first-choice leaf",
        flush=True,
    )

    # ---- exact oracle (f32 on host via the exact kernel, bf16) ------
    def run(fn):
        out = fn()
        vals = np.asarray(out[0][:1])  # force full execution + transfer
        float(vals.sum())
        return out

    t0 = time.time()
    ev, ei = run(lambda: pallas_knn(q_dev, bank_dev, args.k))
    print(f"[exact {store.__name__}] first call {time.time()-t0:.1f}s",
          flush=True)
    t0 = time.time()
    for _ in range(args.iters):
        ev, ei = run(lambda: pallas_knn(q_dev, bank_dev, args.k))
    dt_exact = (time.time() - t0) / args.iters
    exact_sets = [set(r) for r in np.asarray(ei)]
    print(
        f"[exact {store.__name__}] {dt_exact*1e3:.0f} ms "
        f"({args.queries/dt_exact:,.0f} q/s/chip)",
        flush=True,
    )

    perm_np = np.asarray(perm)
    for n_probe in args.probes:
        t0 = time.time()
        vals, idx = run(lambda: ivf_search(
            q_dev, ivf_bank, cent, leaf_valid, args.k,
            cap=cap, n_probe=n_probe, block_q=args.block_q,
        ))
        t_first = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            vals, idx = run(lambda: ivf_search(
                q_dev, ivf_bank, cent, leaf_valid, args.k,
                cap=cap, n_probe=n_probe, block_q=args.block_q,
            ))
        dt = (time.time() - t0) / args.iters
        orig = perm_np[np.asarray(idx)]
        recall = np.mean([
            len(exact_sets[i] & set(orig[i])) / args.k
            for i in range(args.queries)
        ])
        print(
            f"[ivf L={n_probe:3d}] {dt*1e3:6.0f} ms "
            f"({args.queries/dt:8,.0f} q/s/chip, {dt_exact/dt:4.1f}x exact) "
            f"recall@{args.k} {recall:.4f} "
            f"(first call {t_first:.1f}s, scans {n_probe*cap/args.rows:.1%})",
            flush=True,
        )


if __name__ == "__main__":
    main()
