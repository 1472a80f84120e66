"""Feasibility probe: int4 matmul + the Pallas kNN kernel with int4 inputs.

If the MXU path accepts int4 at ~2x int8 throughput, a 4-bit bank (half
the HBM of int8, recall recovered by exact rerank) would lift the exact
kNN ceiling. This just measures raw support/speed — no backend change.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import jax.numpy as jnp


def bench(tag, fn, iters=3):
    try:
        out = fn()
        np.asarray(out[:1]).sum()
    except Exception as e:
        print(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:300]}")
        return
    t0 = time.time()
    for _ in range(iters):
        out = fn()
        np.asarray(out[:1]).sum()
    dt = (time.time() - t0) / iters
    print(f"[{tag}] {dt*1e3:.1f} ms", flush=True)


def main():
    print("device:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    q8 = rng.integers(-7, 8, (21904, 768), dtype=np.int8)
    b8 = rng.integers(-7, 8, (1_024_000, 768), dtype=np.int8)

    qi8 = jnp.asarray(q8)
    bi8 = jnp.asarray(b8)

    @jax.jit
    def dot_i8(q, b):
        return jax.lax.dot_general(
            q, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    # Matmul output (21904, 1.024M) int32 = 90 GB — block it.
    @jax.jit
    def blocked_max_i8(q, b):
        def body(i, acc):
            blk = jax.lax.dynamic_slice(b, (i * 8192, 0), (8192, 768))
            s = jax.lax.dot_general(
                q, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return jnp.maximum(acc, s.max(axis=1))
        return jax.lax.fori_loop(
            0, b.shape[0] // 8192, body,
            jnp.full((q.shape[0],), -(2**30), jnp.int32),
        )

    bench("xla blocked max int8", lambda: blocked_max_i8(qi8, bi8))

    try:
        qi4 = qi8.astype(jnp.int4)
        bi4 = bi8.astype(jnp.int4)
        print("int4 cast ok:", qi4.dtype, flush=True)
    except Exception as e:
        print("int4 cast FAILED:", e)
        return

    @jax.jit
    def blocked_max_i4(q, b):
        def body(i, acc):
            blk = jax.lax.dynamic_slice(b, (i * 8192, 0), (8192, 768))
            s = jax.lax.dot_general(
                q, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return jnp.maximum(acc, s.max(axis=1))
        return jax.lax.fori_loop(
            0, b.shape[0] // 8192, body,
            jnp.full((q.shape[0],), -(2**30), jnp.int32),
        )

    bench("xla blocked max int4", lambda: blocked_max_i4(qi4, bi4))

    # The fused kernel with int4 refs (Mosaic support is the question).
    from hbird_tpu.ops.knn_pallas import pallas_knn

    bench("pallas knn int8 (reference)", lambda: pallas_knn(qi8, bi8, 30)[0])
    bench("pallas knn int4", lambda: pallas_knn(qi4, bi4, 30)[0])


if __name__ == "__main__":
    main()
