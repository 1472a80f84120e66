"""Characterize the production NN backends on a 1.024M-row bank.

VERDICT r1 weak #4: the *default* engine backend (nn_method='scann' ->
approx + reorder(120)) was the least-characterized path. This measures,
for each backend configuration:

- throughput (q/s/chip, 87,616 ViT-B/14@518 queries x 1.024M bank, k=30),
- recall@30 against an exact f32 oracle (8,192-query subset),
- mean relative score error of the returned top-1.

Queries are a half/half mix of bank-like vectors (bank row + noise) and
free gaussians — retrieval-like and adversarial regimes together.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

ap = argparse.ArgumentParser()
ap.add_argument(
    "--hetero", action="store_true",
    help="Scale each bank row by a lognormal factor (sigma=1: norms span "
         "~2 orders of magnitude) instead of unit norms. The engine "
         "L2-normalizes rows it banks itself (hbird_eval.py:368), so the "
         "default unit-norm geometry is ITS regime — but injected banks "
         "(torch checkpoints, --f-mem-p loads) need not be normalized, "
         "and there a single global int8 scale starves small-norm rows "
         "of resolution while quantization='int8_rows' keeps per-row "
         "precision. This mode measures exactly that split.")
ap.add_argument(
    "--hetero-cols", action="store_true",
    help="ViT-like OUTLIER-DIM geometry: a few fixed high-magnitude "
         "feature dims shared by every row (the well-documented ViT "
         "outlier channels), discriminative signal in the rest. The row "
         "abs-max scale is set by the outliers, crushing the signal "
         "dims' int8 resolution — the regime score_ah's "
         "dimensions_per_block (per-column-block scales) and "
         "anisotropic_quantization_threshold (direction-aware rounding) "
         "exist for. Queries are bank-like only (retrieval regime).")
args = ap.parse_args()
if args.hetero and args.hetero_cols:
    # The two modes build different bank/query geometries AND pick the
    # oracle cache by a first-match ternary — combined they'd score a
    # hybrid geometry against the stale pure---hetero oracle.
    ap.error("--hetero and --hetero-cols are mutually exclusive")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
from hbird_tpu.nn.search_exact import NearestNeighborSearchExact
from hbird_tpu.ops.knn import exact_knn

D, K = 768, 30
M = 1_024_000
QN = 64 * (518 // 14) ** 2  # 87,616
QR = 8_192  # recall subset

print("device:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
if args.hetero_cols:
    # Outlier channels: 6 fixed dims at ~40x the signal dims, shared
    # (with sign) by every row — the structure real ViT patch features
    # carry. After row L2-normalization the outliers still dominate each
    # row's abs-max, so the per-row int8 scale starves the signal dims.
    mu = np.zeros(D, np.float32)
    out_dims = rng.choice(D, 6, replace=False)
    mu[out_dims] = 40.0 * rng.choice([-1.0, 1.0], 6).astype(np.float32)
    bank = mu + rng.normal(size=(M, D)).astype(np.float32)
else:
    bank = rng.normal(size=(M, D)).astype(np.float32)
bank /= np.linalg.norm(bank, axis=1, keepdims=True)
if args.hetero:
    row_scale = rng.lognormal(mean=0.0, sigma=1.0, size=(M, 1)).astype(np.float32)
    bank *= row_scale
if args.hetero_cols:
    src = rng.integers(0, M, size=QN)
    queries = (
        bank[src] + 0.15 * rng.normal(size=(QN, D)).astype(np.float32)
    ).astype(np.float32)
else:
    q_free = rng.normal(size=(QN // 2, D)).astype(np.float32)
    src = rng.integers(0, M, size=QN - QN // 2)
    q_like = bank[src] + 0.3 * rng.normal(size=(QN - QN // 2, D)).astype(np.float32)
    queries = np.concatenate([q_like.astype(np.float32), q_free])
    rng.shuffle(queries)

import os

_cache = ("/tmp/bench_backends_oracle_hetero_v1.npz" if args.hetero
          else "/tmp/bench_backends_oracle_hcols_v1.npz" if args.hetero_cols
          else "/tmp/bench_backends_oracle_v1.npz")
if os.path.exists(_cache):
    z = np.load(_cache)
    oracle_idx, oracle_top1 = z["idx"], z["top1"]
    print("oracle loaded from cache", flush=True)
else:
    print("computing f32 oracle on recall subset...", flush=True)
    t0 = time.time()
    oracle_vals, oracle_idx = exact_knn(
        jnp.asarray(queries[:QR]), jnp.asarray(bank), K,
        query_block=4096, bank_block=32768,
    )
    oracle_idx = np.asarray(oracle_idx)
    oracle_top1 = np.asarray(oracle_vals)[:, 0]
    np.savez(_cache, idx=oracle_idx, top1=oracle_top1)
    print(f"oracle done ({time.time()-t0:.1f}s)", flush=True)

q_dev = jnp.asarray(queries)


def characterize(tag, nn):
    # Throughput of the DEVICE-side fused path (queries resident, as in
    # the engine's jitted eval step); only a tiny slice is pulled back to
    # force remote execution.
    t0 = time.time()
    vals, idx, _ = nn.search_with_labels(q_dev, K)
    np.asarray(vals[:1])
    t_first = time.time() - t0
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        vals, idx, _ = nn.search_with_labels(q_dev, K)
        np.asarray(vals[:1])
    dt = (time.time() - t0) / iters
    # recall + score error on the subset
    sub_idx = np.asarray(idx[:QR])
    sub_vals = np.asarray(vals[:QR])
    recall = np.mean([
        len(set(sub_idx[i]) & set(oracle_idx[i])) / K for i in range(QR)
    ])
    rel_err = np.mean(
        np.abs(sub_vals[:, 0] - oracle_top1) / np.maximum(np.abs(oracle_top1), 1e-6)
    )
    print(
        f"{tag:32s}: {QN/dt:>9,.0f} q/s/chip  recall@30={recall:.4f}  "
        f"top1 rel score err={rel_err:.4f}  (first call {t_first:.1f}s)",
        flush=True,
    )
    return recall, QN / dt


configs = [
    ("exact bf16 (pallas)",
     lambda: NearestNeighborSearchExact(bank, n_neighbors=K, use_fp16=True)),
    ("scann DEFAULT (approx bf16, no reorder)",
     lambda: NearestNeighborSearchApprox(bank, n_neighbors=K)),
    ("approx f32 + reorder120 (ScaNN-literal)",
     lambda: NearestNeighborSearchApprox(
         bank, n_neighbors=K, use_fp16=False, num_reordering_candidates=120)),
    ("int8 (no rerank)",
     lambda: NearestNeighborSearchExact(bank, n_neighbors=K, use_int8=True)),
    ("int8_rows / SQ8 (no rerank)",
     lambda: NearestNeighborSearchExact(
         bank, n_neighbors=K, quantization="int8_rows")),
    ("int8_asym (bf16 q x int8 bank)",
     lambda: NearestNeighborSearchExact(
         bank, n_neighbors=K, quantization="int8_asym")),
    ("int8 + rerank120",
     lambda: NearestNeighborSearchExact(
         bank, n_neighbors=K, use_int8=True, num_reordering_candidates=120)),
    # NB: this bank is an UNCLUSTERED gaussian — the worst case for a
    # tree (recall ~= scanned fraction). The row documents throughput;
    # the recall curve on realistic clustered geometry lives in
    # scripts/bench_ivf.py (recall@30 ~1.0 at probe 32 after refinement).
    ("ivf tree (probe 32/512; unclustered!)",
     lambda: NearestNeighborSearchApprox(
         bank, n_neighbors=K, use_tree=True)),
]

if args.hetero:
    # The quantization split is the question here; skip the tree row
    # (clustered-geometry recall lives in bench_ivf.py either way).
    keep = ("exact bf16 (pallas)", "int8 (no rerank)",
            "int8_rows / SQ8 (no rerank)",
            "int8_asym (bf16 q x int8 bank)", "int8 + rerank120")
    configs = [c for c in configs if c[0] in keep]

if args.hetero_cols:
    # The score_ah knobs ladder: same int8_asym storage/kernel, each row
    # adds one knob (approx backend — the knobs are ScaNN params).
    configs = [
        ("exact bf16 (pallas)",
         lambda: NearestNeighborSearchExact(
             bank, n_neighbors=K, use_fp16=True)),
        ("int8_asym plain",
         lambda: NearestNeighborSearchApprox(
             bank, n_neighbors=K, quantization="int8_asym")),
        ("int8_asym + dims_per_block=4",
         lambda: NearestNeighborSearchApprox(
             bank, n_neighbors=K, quantization="int8_asym",
             dimensions_per_block=4)),
        ("int8_asym + dpb=4 + aniso T=0.2",
         lambda: NearestNeighborSearchApprox(
             bank, n_neighbors=K, quantization="int8_asym",
             dimensions_per_block=4,
             anisotropic_quantization_threshold=0.2)),
    ]

for tag, make in configs:
    try:
        nn = make()
        characterize(tag, nn)
        del nn
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
