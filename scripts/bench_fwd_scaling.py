#!/usr/bin/env python3
"""ViT forward throughput vs batch size and dtype on the live chip.

Motivation: at batch 16 the ViT-B/14 @518 forward measures ~110 img/s
f32 / ~135 img/s bf16 — only ~16% of the v5e's bf16 MXU peak for the
~233 GFLOP/img the model costs. Either the per-call dispatch through
the tunnel dominates at small batches (then throughput should scale
with batch), or the program itself is latency/HBM-bound (then it
won't). This script measures the curve so the default engine batch
recommendation is evidence-based.

Usage: python -u scripts/bench_fwd_scaling.py [--input-size 518]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-size", type=int, default=518)
    ap.add_argument("--preset", default="dinov2_vitb14")
    ap.add_argument("--batches", type=int, nargs="*", default=[16, 32, 64])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--attention-impl", default="xla",
                    choices=["xla", "flash", "chunked"],
                    help="chunked = lax.scan over query blocks (the "
                         "VERDICT r4 item-7 mechanism: live logits slice "
                         "(B,H,chunk,N) instead of (B,H,N,N))")
    ap.add_argument("--chunk-q", type=int, default=256)
    ap.add_argument("--dtypes", nargs="*",
                    default=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import dataclasses

    from hbird_tpu.models.vit import VIT_PRESETS, ViT

    base = ViT(VIT_PRESETS[args.preset])
    params = base.prepare_params(
        base.init(jax.random.PRNGKey(0)), args.input_size
    )
    vit = base
    n_tok = (args.input_size // vit.config.patch_size) ** 2
    # FLOPs/img: transformer matmuls + attention scores/values.
    d, mlp = vit.config.width, 4 * vit.config.width
    per_tok_layer = 2 * (4 * d * d + 2 * d * mlp)
    attn = 2 * 2 * n_tok * n_tok * d
    flops_img = vit.config.depth * (per_tok_layer * n_tok + attn)

    rng = np.random.default_rng(0)
    for dtype in args.dtypes:
        # Compute dtype is a CONFIG property (matmuls in compute_dtype,
        # layernorm/softmax kept f32) — casting inputs alone does nothing.
        vit = ViT(
            dataclasses.replace(
                base.config, compute_dtype=getattr(jnp, dtype),
                attention_impl=args.attention_impl,
                attention_chunk_q=args.chunk_q,
            )
        )
        p = params

        fwd = jax.jit(
            lambda pp, x, v=vit: v.apply(pp, x)["x_norm_patchtokens"]
        )
        for b in args.batches:
            imgs = jnp.asarray(
                rng.normal(size=(b, 3, args.input_size, args.input_size)),
                jnp.float32,
            )
            t0 = time.time()
            out = fwd(p, imgs)
            float(np.asarray(out[:1, :1, :1]).sum())  # force (tunnel)
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(args.iters):
                t1 = time.time()
                out = fwd(p, imgs)
                float(np.asarray(out[:1, :1, :1]).sum())
                best = min(best, time.time() - t1)
            print(
                f"[{dtype}/{args.attention_impl} b={b:3d}] {best*1e3:8.1f} ms/batch -> "
                f"{b/best:7.1f} img/s ({b*flops_img/best/1e12:6.1f} "
                f"TFLOP/s effective; first call {compile_s:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
