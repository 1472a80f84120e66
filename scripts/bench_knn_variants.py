"""Compare kNN implementations on the real TPU:
XLA blockwise (lax.top_k merge) vs Pallas fused kernel, f32 vs bf16,
plus block-size sweep for the Pallas kernel."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from hbird_tpu.ops.knn import exact_knn
from hbird_tpu.ops.knn_pallas import pallas_knn

print("device:", jax.devices(), flush=True)

D, K = 768, 30
M = 1_024_000
QN = 64 * (518 // 14) ** 2  # 87616

rng = np.random.default_rng(0)
bank = rng.normal(size=(M, D)).astype(np.float32)
bank /= np.linalg.norm(bank, axis=1, keepdims=True)
queries = rng.normal(size=(QN, D)).astype(np.float32)

# correctness spot-check set
small_q = queries[:256]


def timeit(fn, iters=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def report(name, dt):
    print(
        f"{name}: {dt*1e3:8.1f} ms -> {QN/dt:>10,.0f} q/s/chip "
        f"({QN*M*D*2/dt/1e12:5.1f} TFLOP/s eff)",
        flush=True,
    )


for dtype, tag in ((jnp.bfloat16, "bf16"),):
    bank_d = jax.device_put(jnp.asarray(bank, dtype))
    q_d = jax.device_put(jnp.asarray(queries, dtype))

    # Pallas variants
    for bq, bm in ((512, 2048), (1024, 4096), (512, 8192), (2048, 2048)):
        try:
            t0 = time.time()
            dt, (vals, idx) = timeit(
                lambda: pallas_knn(q_d, bank_d, K, block_q=bq, block_m=bm)
            )
            report(f"pallas[{tag}] bq={bq} bm={bm}", dt)
        except Exception as e:
            print(f"pallas[{tag}] bq={bq} bm={bm} FAILED: {type(e).__name__} {e}",
                  flush=True)

# correctness: pallas vs xla on a subset (f32)
bank_f = jax.device_put(jnp.asarray(bank))
vals_p, idx_p = pallas_knn(jnp.asarray(small_q), bank_f, K)
vals_x, idx_x = exact_knn(jnp.asarray(small_q), bank_f, K)
same = np.mean(np.asarray(idx_p) == np.asarray(idx_x))
close = np.allclose(np.asarray(vals_p), np.asarray(vals_x), rtol=1e-4, atol=1e-4)
print(f"pallas vs xla agreement: idx {same:.4f}, vals close: {close}", flush=True)
