#!/usr/bin/env python3
"""block_q x block_m sweep for the carry-merge Pallas kNN kernel.

Motivation (round 3, VERDICT #2): merge cost is dominated by per-tile
while-loop iterations = max over the q-tile's rows of that row's
insertion count — row DIVERGENCE inflates it. Smaller block_q reduces
the max-over-rows inflation at constant total pass cost (pass cost
scales with rows*cols); block_q=512 was measured worse than 256 in
round 1, but 64/128 were never tried. block_m trades boundary-pass
count against per-tile insertion density.

Run on the real TPU: python -u scripts/bench_block_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from hbird_tpu.ops.knn_pallas import pallas_knn

D, K = 768, 30
M = 1_024_000
QN = 64 * (518 // 14) ** 2  # 87616


def force(x):
    float(np.asarray(x).sum())


def main():
    print("device:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    bank = rng.normal(size=(M, D)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    queries = rng.normal(size=(QN, D)).astype(np.float32)

    bank_d = jax.device_put(jnp.asarray(bank, jnp.bfloat16))
    q_d = jax.device_put(jnp.asarray(queries, jnp.bfloat16))
    force(bank_d[:1])
    force(q_d[:1])

    # Reference indices for correctness spot-check (first 512 queries).
    ref_vals, ref_idx = pallas_knn(
        q_d[:512], bank_d, K, block_q=256, block_m=8192, merge_mode="carry"
    )
    ref_idx = np.sort(np.asarray(ref_idx), -1)

    results = {}
    import os
    env_cfg = os.environ.get("SWEEP_CONFIGS")
    if env_cfg:
        configs = []
        for part in env_cfg.split(";"):
            mode, bq, bm = part.split(",")
            configs.append((int(bq), int(bm), mode))
    else:
        configs = []
        for bq in (64, 128, 256):
            for bm in (4096, 8192, 16384):
                configs.append((bq, bm, "carry"))
        configs.append((128, 8192, "carry_lazy"))

    for bq, bm, mode in configs:
        tag = f"{mode} q{bq} m{bm}"
        try:
            t0 = time.time()
            vals, idx = pallas_knn(
                q_d, bank_d, K, block_q=bq, block_m=bm, merge_mode=mode
            )
            force(vals[:1])
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t1 = time.time()
                vals, idx = pallas_knn(
                    q_d, bank_d, K, block_q=bq, block_m=bm, merge_mode=mode
                )
                force(vals[:1])
                best = min(best, time.time() - t1)
            got = np.sort(np.asarray(idx[:512]), -1)
            ok = (got == ref_idx).all()
            qps = QN / best
            results[tag] = qps
            print(
                f"[{tag}] compile {compile_s:6.1f}s | {best*1e3:7.1f} ms "
                f"-> {qps:>9,.0f} q/s ({QN*M*D*2/best/1e12:5.1f} TF/s) "
                f"| idx {'OK' if ok else 'MISMATCH'}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"[{tag}] FAILED: {repr(e)[:200]}", flush=True)

    if results:
        best = max(results, key=results.get)
        print(f"BEST: {best} at {results[best]:,.0f} q/s", flush=True)


if __name__ == "__main__":
    main()
