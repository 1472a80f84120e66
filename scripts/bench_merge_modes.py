"""Pallas kNN merge-mode shootout on the real chip (1.024M-row bench).

single = one-candidate-per-pass insertion (round-1 default, 52k q/s).
bucket = tournament/group-max extraction (up to n_buckets inserts per
round; TODO.md round-1 'remaining idea').
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from hbird_tpu.ops.knn_pallas import pallas_knn

D, K = 768, 30
M = 1_024_000
QN = 64 * (518 // 14) ** 2

print("device:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
bank = rng.normal(size=(M, D)).astype(np.float32)
bank /= np.linalg.norm(bank, axis=1, keepdims=True)
queries = rng.normal(size=(QN, D)).astype(np.float32)

bank_d = jax.device_put(jnp.asarray(bank, jnp.bfloat16))
q_d = jax.device_put(jnp.asarray(queries, jnp.bfloat16))

ref_idx = None
CONFIGS = [
    ("carry", 256, 8192, 32),
    ("carry_lazy", 256, 8192, 32),
    ("carry", 256, 8192, 32),
    ("carry_lazy", 256, 8192, 32),
]
for mode, bq, bm, nb in CONFIGS:
    tag = f"{mode} bq={bq} bm={bm}" + (f" nb={nb}" if mode == "bucket" else "")
    try:
        t0 = time.time()
        vals, idx = pallas_knn(
            q_d, bank_d, K, block_q=bq, block_m=bm,
            merge_mode=mode, n_buckets=nb,
        )
        float(np.asarray(vals).sum())
        t_first = time.time() - t0
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            vals, idx = pallas_knn(
                q_d, bank_d, K, block_q=bq, block_m=bm,
                merge_mode=mode, n_buckets=nb,
            )
            float(np.asarray(vals[:1]).sum())
        dt = (time.time() - t0) / iters
        idx_np = np.sort(np.asarray(idx), -1)
        if ref_idx is None:
            ref_idx = idx_np
            agree = 1.0
        else:
            agree = float((idx_np == ref_idx).mean())
        print(
            f"{tag:32s}: {dt*1e3:7.1f} ms -> {QN/dt:>9,.0f} q/s/chip "
            f"({QN*M*D*2/dt/1e12:5.1f} TFLOP/s eff)  idx agree={agree:.4f} "
            f"(first {t_first:.0f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
