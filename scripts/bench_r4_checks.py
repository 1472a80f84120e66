#!/usr/bin/env python3
"""Round-4 TPU measurements: L2 kernel throughput + per-query IVF recall.

Two VERDICT r3 'done' criteria measured on the real chip:
- item 4: Pallas expanded-norm L2 within ~1.5x of dot-product throughput
  (1.024M x 768 bf16 bank, k=30, q256/m8192 carry merge);
- item 5: 2048 SPARSE (iid-ordered) queries against a clustered 1M bank,
  probe 32/512 — tile probing measured recall 0.538 in round 3; the
  per-query path must reach >= 0.95 at matched scan budget.

Sequential first-calls only (concurrent fresh compiles starve each other
through the tunnel); every phase prints with flush before dispatching.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def force(x):
    float(np.asarray(x[:1]).sum())


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools

    import jax.numpy as jnp

    log(f"device: {jax.devices()[0]}")

    D, K = 768, 30
    M = 1_024_000
    QN = 64 * (518 // 14) ** 2  # 87,616 — bench.py's query count

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def gen(key, n, m):
        x = jax.random.normal(key, (n, m), jnp.float32)
        return (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(
            jnp.bfloat16
        )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    bank = gen(k1, M, D)
    q = gen(k2, QN, D)
    force(bank)
    force(q)
    log("data generated on-device")

    from hbird_tpu.ops.knn_pallas import pallas_knn

    def time_kernel(name, fn, iters=3):
        t0 = time.time()
        out = fn()
        force(out[0])
        log(f"{name}: first call {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(iters):
            t1 = time.time()
            out = fn()
            force(out[0])
            best = min(best, time.time() - t1)
        qps = QN / best
        log(f"{name}: best {best*1e3:.0f} ms -> {qps:,.0f} q/s/chip")
        return qps

    # --- L2 vs dot (item 4) -------------------------------------------
    dot_qps = time_kernel(
        "dot carry",
        lambda: pallas_knn(q, bank, K, block_q=256, block_m=8192),
    )
    l2_qps = time_kernel(
        "l2 carry",
        lambda: pallas_knn(
            q, bank, K, block_q=256, block_m=8192, distance="l2"
        ),
    )
    log(
        f"L2/dot ratio: {dot_qps/l2_qps:.2f}x slower "
        f"({'PASS' if l2_qps * 1.5 >= dot_qps else 'FAIL'} vs 1.5x budget)"
    )

    # --- per-query IVF sparse recall (item 5) --------------------------
    from hbird_tpu.ops.ivf import (
        assign_leaves, balanced_layout, build_ivf_arrays, ivf_search,
        tile_coherence, train_centroids, tree_layout,
    )

    # Clustered bank: 64 semantic centers, unit-norm (the r3 recipe).
    @functools.partial(jax.jit, static_argnums=(1, 2, 3))
    def gen_clustered(key, n, m, nc):
        kc, kw, kn = jax.random.split(key, 3)
        c = jax.random.normal(kc, (nc, m), jnp.float32)
        c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
        who = jax.random.randint(kw, (n,), 0, nc)
        x = c[who] + 0.25 * jax.random.normal(kn, (n, m), jnp.float32)
        return (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(
            jnp.bfloat16
        )

    cbank = gen_clustered(k3, M, D, 64)
    force(cbank)
    log("clustered bank generated")

    n_leaves, cap = tree_layout(M, 512)
    cent = train_centroids(
        cbank[:131072].astype(jnp.float32), n_leaves, iters=8
    )
    choices, scores = assign_leaves(cbank, cent, n_choices=3,
                                    return_scores=True)
    slots, fill = balanced_layout(choices, n_leaves, cap, scores=scores)
    ivf_bank, _, perm = build_ivf_arrays(cbank, None, slots, n_leaves, cap)
    leaf_valid = jnp.asarray(fill, jnp.int32)
    perm_np = np.asarray(perm)
    log(f"tree built: {n_leaves} leaves x cap {cap}")

    # Sparse queries: perturbed bank rows in IID ORDER (no leaf coherence).
    rng = np.random.default_rng(1)
    sel = rng.integers(0, M, 2048)
    qs = (
        np.asarray(cbank[jnp.asarray(sel)], np.float32)
        + 0.02 * rng.normal(size=(2048, D))
    ).astype(np.float32)
    qs_j = jnp.asarray(qs, jnp.bfloat16)
    coh = tile_coherence(qs_j, cent, 256)
    log(f"sparse-query tile coherence: {coh:.1f} distinct leaves/tile")

    from hbird_tpu.ops.knn import exact_knn

    ev, ei = exact_knn(qs_j, cbank, K, query_block=2048)
    exact_idx = np.asarray(ei)
    log("exact oracle done")

    def recall(idx_ivf):
        orig = perm_np[np.asarray(idx_ivf)]
        hits = sum(
            len(set(orig[i]) & set(exact_idx[i])) for i in range(len(orig))
        )
        return hits / exact_idx.size

    for mode in ("tile", "query"):
        t0 = time.time()
        _, idx = ivf_search(
            qs_j, ivf_bank, cent, leaf_valid, K,
            cap=cap, n_probe=32, block_q=256 if mode == "tile" else 128,
            probe_mode=mode,
        )
        idx_np = np.asarray(idx)
        dt = time.time() - t0
        r = recall(idx_np)
        log(f"probe_mode={mode}: recall@{K} {r:.3f} "
            f"(first-call wall {dt:.1f}s incl. compile)")
        # warm timing
        t1 = time.time()
        _, idx = ivf_search(
            qs_j, ivf_bank, cent, leaf_valid, K,
            cap=cap, n_probe=32, block_q=256 if mode == "tile" else 128,
            probe_mode=mode,
        )
        np.asarray(idx)
        log(f"probe_mode={mode}: warm {time.time()-t1:.2f}s for 2048 queries")

    log("ALL DONE")


if __name__ == "__main__":
    main()
