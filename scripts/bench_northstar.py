"""North-star-scale demonstration on ONE chip.

BASELINE.md north star: exact-kNN Hummingbird eval of DINOv2 ViT-B/14 on
full Pascal VOC (>=10M-patch bank, k=30) in <10 min on v5e-8. This runs
the EVAL phase at exactly that scale on a single chip:

- bank: 10,240,000 x 768 (int8 storage by default, bf16 re-rank exact),
- val set: 1,449 images @518 (VOC val size) of synthetic uint8 batches,
- full fused step: ViT-B/14 bf16 forward -> pallas kNN -> cross-attention
  -> bilinear upsample -> argmax -> confusion matrix,

and reports end-to-end eval wall-clock + queries/sec/chip. (The memory
BUILD phase at this scale is backbone-bound: 10,581 train images x 2
augmentation epochs / ~135 img/s bf16 ~ 2.6 min/chip on top.)
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
    ap.add_argument("--bank-rows", type=int, default=10_240_000)
    ap.add_argument("--n-val", type=int, default=1449)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--input-size", type=int, default=518)
    ap.add_argument("--num-classes", type=int, default=21)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--nn-method", default="ivf", choices=["exact", "ivf"],
                    help="ivf (default — the winning backend: 121-129s vs "
                         "185.9s exact at 10.24M on the clustered bank, "
                         "MEASURED recall@30 0.982 at probe 32/512) = "
                         "leaf-partitioned tree scan, streamed build; "
                         "exact = fused flat kernel")
    ap.add_argument("--num-leaves", type=int, default=512)
    ap.add_argument("--n-probe", type=int, default=32)
    ap.add_argument("--tree-slack", type=float, default=1.15)
    ap.add_argument("--save-index", type=str, default=None, metavar="DIR",
                    help="After the tree build, serialize the BUILT index "
                         "to this .treedir (timed).")
    ap.add_argument("--load-index", type=str, default=None, metavar="DIR",
                    help="Skip the bank+tree build entirely and restore "
                         "the index from this .treedir (timed). On this "
                         "dev host the reload is tunnel-bound (~15 MB/s "
                         "uploads); on a real host it is NVMe+PCIe-bound.")
    ap.add_argument("--probe-mode", default="tile",
                    choices=["tile", "query", "auto"],
                    help="IVF probing granularity through the ENGINE "
                         "(VERDICT r4 item 6: probe_mode=query flags the "
                         "backend non-jittable, so the engine eval step "
                         "runs eagerly — this measures what that costs).")
    ap.add_argument("--miou-delta", action="store_true",
                    help="VERDICT r4 item 3: measure the LABEL-TRANSFER "
                         "mIoU cost of probing n_probe leaves vs the "
                         "full-probe oracle on the SAME bank (full probe "
                         "IS exact search: leaf_valid masks pad slots). "
                         "Bank labels are cluster-correlated (75%% of the "
                         "mass on center_id %% C), queries are perturbed "
                         "bank rows with known classes, predictions run "
                         "through the engine's beta=0.02 softmax "
                         "aggregation (core.attention).")
    args = ap.parse_args()
    if args.save_index:
        assert args.nn_method == "ivf", "--save-index requires --nn-method ivf"

    from hbird_tpu import HbirdEvaluation
    from hbird_tpu.models import FeatureExtractor
    from hbird_tpu.models.vit import VIT_PRESETS, ViT

    print("device:", jax.devices(), flush=True)
    cfg = VIT_PRESETS["dinov2_vitb14"]
    vit = ViT(cfg)
    params = vit.prepare_params(vit.init(jax.random.PRNGKey(0)), args.input_size)
    s = args.input_size // cfg.patch_size
    fe = FeatureExtractor(
        vit, params, eval_spatial_resolution=s, d_model=cfg.width, use_bf16=True
    )

    # Synthetic bank injected through the engine's load hook: build the
    # engine on a tiny train stream, then replace the bank.
    rng = np.random.default_rng(0)
    tiny_imgs = rng.integers(0, 255, (2, 3, args.input_size, args.input_size),
                             dtype=np.uint8)
    tiny_masks = rng.integers(0, args.num_classes,
                              (2, 1, args.input_size, args.input_size)).astype(np.uint8)
    use_int8 = not args.no_int8
    scale = 0.2 / 127.0
    if args.nn_method == "ivf":
        assert use_int8, "the ivf north-star variant is int8-only"
        nn_params = dict(
            use_int8=True, bank_scale=scale, num_leaves=args.num_leaves,
            num_leaves_to_search=args.n_probe, tree_slack=args.tree_slack,
            probe_mode=args.probe_mode,
        )
    else:
        nn_params = {} if args.no_int8 else {"use_int8": True}
    t0 = time.time()
    ev = HbirdEvaluation(
        fe, [(tiny_imgs, tiny_masks)], num_classes=args.num_classes,
        n_neighbours=args.k, nn_method=args.nn_method,
        nn_params=nn_params,
        bf16_bank=True,
        # Pre-compile the eval step against the INJECTED bank's shape so
        # the Mosaic compile overlaps the slab-wise bank build below.
        aot_eval=dict(
            batch_size=args.batch_size,
            input_size=args.input_size,
            ignore_index=255,
            bank_rows=args.bank_rows,
        ),
    )
    print(f"engine up ({time.time()-t0:.1f}s); building {args.bank_rows:,}-row bank",
          flush=True)

    t0 = time.time()
    d = cfg.width
    # A 10.24M x 768 bank only fits ONE chip quantized (int8 = 7.9 GB; f32
    # would be 31 GB), so build it int8 directly, slab by slab, with a
    # fixed global scale (unit-norm rows: |component| <~ 0.2) — exactly
    # the backend's global-scale symmetric scheme.
    # Small slabs: the f32 generation temps (normal + unit-norm division)
    # cost ~2 x slab x d x 4B on top of the growing int8 bank.
    slab_rows = 512_000
    slab_keys = [
        jax.random.fold_in(jax.random.PRNGKey(1), i)
        for i in range(-(-args.bank_rows // slab_rows))
    ]

    import functools

    # CLUSTERED synthetic rows, not iid noise: real patch embeddings are
    # strongly clustered (patches of one class/image share appearance),
    # and IVF recall depends on that structure — measured at this scale,
    # an IID bank gives recall ~= the probe fraction (0.0718 at probe
    # 32/512: the leaves carry no information), while a clustered bank
    # matches the 1M/4M clustered measurements. 4096 mixture centers ->
    # ~8 centers per leaf; exact-path timing is unaffected (same FLOPs).
    n_centers = 4096
    centers = jax.random.normal(
        jax.random.PRNGKey(42), (n_centers, d), jnp.float32
    ) * 3.0

    @jax.jit
    def make_slab(sub, n_static=slab_rows):
        kc, kn = jax.random.split(sub)
        ids = jax.random.randint(kc, (n_static,), 0, n_centers)
        x = centers[ids] + 0.3 * jax.random.normal(
            kn, (n_static, d), jnp.float32
        )
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        if use_int8:
            return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        return x.astype(jnp.bfloat16)

    @jax.jit
    def make_label_slab(sub, n_static=slab_rows):
        # Cluster-correlated soft labels: 75% of the mass on the source
        # center's class (center_id % C), 25% uniform noise — mimics
        # patch soft labels (patches of one class cluster in feature
        # space) and makes the --miou-delta measurement meaningful;
        # uniform-random labels would score identical garbage under
        # every backend. Same shape/cost as the old uniform draw.
        kc, _ = jax.random.split(sub)
        ids = jax.random.randint(kc, (n_static,), 0, n_centers)
        onehot = jax.nn.one_hot(ids % args.num_classes, args.num_classes)
        u = jax.random.uniform(
            jax.random.fold_in(sub, 7), (n_static, args.num_classes),
            jnp.float32,
        )
        u = u / jnp.sum(u, axis=1, keepdims=True)
        return 0.75 * onehot + 0.25 * u

    if args.load_index:
        # The PRODUCT restore path: engine load_memory() -> load_tree with
        # the nn_params search keys passed through — the bench times what
        # users actually run, not a hand-rolled copy of it.
        assert args.nn_method == "ivf", "--load-index requires --nn-method ivf"
        assert not args.save_index, (
            "--save-index with --load-index would just re-serialize the "
            "index it restored; save on the build run instead"
        )
        t_l = time.time()
        ev.f_mem_p = args.load_index
        assert ev.load_memory(), f"no index at {args.load_index}"
        nn = ev.NN_algorithm
        jax.block_until_ready(nn.bank)
        print(f"index RESTORED from {args.load_index} in "
              f"{time.time()-t_l:.1f}s ({nn.bank.nbytes/1e9:.1f} GB layout, "
              f"{nn._n_leaves} leaves x cap {nn._cap}; no k-means/layout/"
              "scatter)", flush=True)
    elif args.nn_method == "ivf":
        # STREAMED tree build (ops/ivf.build_tree_streamed): the 7.9 GB
        # flat bank and the 9.1 GB leaf layout cannot coexist on a 16 GB
        # chip (measured: OOM by 131 MB at the scatter), and the slabs
        # are seeded — the flat bank NEVER exists. Three passes over the
        # regenerated slab stream: subsample -> centroids, per-block
        # assignment -> host greedy layout, donated scatter into slabs.
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
        from hbird_tpu.ops.ivf import build_tree_streamed

        def slab_stream():
            for j, sub in enumerate(slab_keys):
                i = j * slab_rows
                n = min(slab_rows, args.bank_rows - i)
                yield (
                    make_slab(sub)[:n],
                    # same `sub` as make_slab: the label slab re-derives
                    # the SAME center ids (split(sub)[0]) for its class
                    # mass; the uniform part folds in its own subkey
                    make_label_slab(sub)[:n],
                )

        parts = build_tree_streamed(
            slab_stream, args.bank_rows, args.num_leaves,
            slack=args.tree_slack, seed=0,
        )
        nn = NearestNeighborSearchApprox.from_tree_state(
            parts["ivf_bank"], parts["ivf_labels"], parts["centroids"],
            parts["leaf_fill"], parts["perm"], parts["slots"],
            cap=parts["cap"], valid_rows=args.bank_rows,
            n_neighbors=args.k,
            bank_scale=scale if use_int8 else None,
            num_leaves=args.num_leaves,
            num_leaves_to_search=args.n_probe, tree_slack=args.tree_slack,
            use_int8=use_int8, probe_mode=args.probe_mode,
        )
        ev.NN_algorithm = nn
        ev.feature_memory = None
        ev.label_memory = None
        jax.block_until_ready(nn.bank)
        print(f"bank + index ready ({time.time()-t0:.1f}s, "
              f"{nn.bank.nbytes/1e9:.1f} GB ivf layout on chip; tree "
              f"{parts['n_leaves']} leaves x cap {parts['cap']}; flat "
              "bank never materialized)", flush=True)
        if args.save_index:
            t_s = time.time()
            nn.save_tree(args.save_index)
            print(f"index saved to {args.save_index} in "
                  f"{time.time()-t_s:.1f}s", flush=True)

        # Measured recall AT THIS SCALE (not extrapolated from 1M/4M):
        # probing ALL leaves through the same tree path IS the exact
        # search (leaf_valid masks pad slots), so recall@k = overlap of
        # the probe-L shortlist with the full-probe oracle on a query
        # sample resembling the workload (perturbed bank rows).
        try:
            from hbird_tpu.ops.ivf import ivf_search

            t_r = time.time()
            r = np.random.default_rng(11)
            # One engine batch's worth of queries (16 imgs x 37^2
            # patches): block-level probing shares a 32-leaf shortlist
            # per sorted 256-query tile, so query DENSITY matters — a
            # sparse probe set (2048 queries over 512 leaves) spreads
            # each tile across ~64 top-1 leaves and measures that
            # artifact (0.538 measured), not the index.
            n_q = 16 * (args.input_size // 14) ** 2
            # DEQUANTIZE the int8 slab rows back to unit-norm scale
            # before perturbing — feeding raw int8 units (+-127) into
            # the quantizer again saturates every component to +-127
            # and measures recall on sign vectors, not on perturbed
            # rows (a round-3 review catch: the first committed number
            # had exactly that bug).
            rows_q = np.asarray(make_slab(slab_keys[0])[:n_q], np.float32)
            if use_int8:
                rows_q = rows_q * scale
            qs = rows_q + 0.05 * r.normal(size=(n_q, d)).astype(np.float32)
            if use_int8:
                q_cast = jnp.asarray(
                    np.clip(np.round(qs / scale), -127, 127), jnp.int8
                )
            else:
                q_cast = jnp.asarray(qs, jnp.bfloat16)

            def probe(n_probe):
                _, idx = ivf_search(
                    q_cast, nn.bank, nn.centroids, nn.leaf_valid, args.k,
                    cap=parts["cap"], n_probe=n_probe, block_q=256,
                )
                return np.asarray(idx)

            got = probe(min(args.n_probe, parts["n_leaves"]))
            oracle = probe(parts["n_leaves"])
            recall = np.mean([
                len(set(got[i]) & set(oracle[i])) / args.k
                for i in range(got.shape[0])
            ])
            print(f"recall@{args.k} at {args.bank_rows:,} rows, probe "
                  f"{args.n_probe}/{parts['n_leaves']}: {recall:.4f} "
                  f"({qs.shape[0]} queries vs full-probe oracle, "
                  f"{time.time()-t_r:.1f}s)", flush=True)
        except Exception as e:  # diagnostics must not break the run
            print(f"recall probe skipped: {e}", flush=True)
    else:
        # Donated in-place writes: concatenating slabs would double peak
        # HBM (slabs + output) and OOM the 16 GB chip at 10.24M rows.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def write(buf, slab, start):
            return jax.lax.dynamic_update_slice(buf, slab, (start, 0))

        bank = jnp.zeros(
            (args.bank_rows, d), jnp.int8 if use_int8 else jnp.bfloat16
        )
        for j, sub in enumerate(slab_keys):
            i = j * slab_rows
            n = min(slab_rows, args.bank_rows - i)
            bank = write(bank, make_slab(sub)[:n], jnp.int32(i))
        # Cheap normalized soft labels (dirichlet's gamma sampler
        # allocates several full-size f32 temps; uniform+normalize needs
        # only one).
        lab_u = jax.random.uniform(
            jax.random.PRNGKey(2), (args.bank_rows, args.num_classes),
            jnp.float32,
        )
        labels = lab_u / jnp.sum(lab_u, axis=1, keepdims=True)
        del lab_u

        # Install the pre-quantized bank directly into the backend (its
        # own int8 path quantizes FROM f32, which cannot exist at this
        # scale).
        nn = ev.NN_algorithm
        nn.bank = bank
        nn.labels = labels
        nn.valid_rows = args.bank_rows
        nn.rerank_bank = None
        if use_int8:
            nn._bank_scale = jnp.float32(scale)
        ev.feature_memory = bank
        ev.label_memory = labels
        jax.block_until_ready(nn.bank)
        print(f"bank + index ready ({time.time()-t0:.1f}s, "
              f"{bank.nbytes/1e9:.1f} GB on chip)", flush=True)

    if args.miou_delta:
        assert args.nn_method == "ivf", "--miou-delta requires --nn-method ivf"
        # Label-transfer mIoU on the SAME bank: probe n_probe leaves vs
        # probing ALL leaves (the exact-search oracle — leaf_valid masks
        # pad slots, so a full probe scans every valid row). Queries are
        # perturbed bank rows whose true class is known (the bank's
        # labels put 75% of their mass on center_id % C), predictions
        # run through the engine's own beta=0.02 softmax aggregation, so
        # the delta is exactly what IVF probing costs the metric.
        from hbird_tpu.core.attention import cross_attention_from_scores

        t_m = time.time()
        r13 = np.random.default_rng(13)
        n_q = 16 * (args.input_size // 14) ** 2
        kc0, _ = jax.random.split(slab_keys[0])
        ids0 = np.asarray(
            jax.random.randint(kc0, (slab_rows,), 0, n_centers)
        )[:n_q]
        gt = (ids0 % args.num_classes).astype(np.int64)
        rows_q = np.asarray(make_slab(slab_keys[0])[:n_q], np.float32)
        if use_int8:
            rows_q = rows_q * scale  # dequantize to unit-norm scale
        qs_d = rows_q + 0.05 * r13.normal(size=rows_q.shape).astype(np.float32)
        q_f = jnp.asarray(qs_d, jnp.float32)
        q_norm = jnp.linalg.norm(q_f, axis=1)

        def transfer_pred(n_probe):
            old = nn.num_leaves_to_search
            nn.num_leaves_to_search = int(n_probe)
            try:
                vals, _, labs = nn.search_with_labels(q_f, args.k)
            finally:
                nn.num_leaves_to_search = old
            agg = cross_attention_from_scores(
                vals[None].astype(jnp.float32), q_norm[None], labs[None]
            )
            return np.asarray(jnp.argmax(agg[0], axis=1))

        def patch_miou(pred):
            ious = []
            for c in range(args.num_classes):
                tp = float(((pred == c) & (gt == c)).sum())
                fp = float(((pred == c) & (gt != c)).sum())
                fn = float(((pred != c) & (gt == c)).sum())
                ious.append(tp / max(tp + fp + fn, 1.0))
            return float(np.mean(ious))

        n_leaves_t = nn._n_leaves
        m_probe = patch_miou(transfer_pred(min(args.n_probe, n_leaves_t)))
        m_full = patch_miou(transfer_pred(n_leaves_t))
        print(
            f"MIOU DELTA at {args.bank_rows:,} rows (label transfer, "
            f"{n_q} queries, k={args.k}): probe {args.n_probe}/"
            f"{n_leaves_t} mIoU={m_probe:.4f} vs full-probe (exact) "
            f"mIoU={m_full:.4f} -> |delta|={abs(m_full - m_probe):.4f} "
            f"({time.time()-t_m:.1f}s)",
            flush=True,
        )

    def val_loader():
        r = np.random.default_rng(3)
        for i in range(0, args.n_val, args.batch_size):
            b = min(args.batch_size, args.n_val - i)
            yield (
                r.integers(0, 255, (b, 3, args.input_size, args.input_size),
                           dtype=np.uint8),
                r.integers(0, args.num_classes,
                           (b, 1, args.input_size, args.input_size)).astype(np.uint8),
            )

    t0 = time.time()
    miou = ev.evaluate(val_loader(), s, ignore_index=255)
    dt = time.time() - t0
    q_total = args.n_val * s * s
    print(
        f"NORTH STAR (1 chip): {args.n_val} val imgs x {args.bank_rows:,}-row "
        f"bank, k={args.k}: evaluate {dt:.1f}s "
        f"({q_total/dt:,.0f} q/s/chip incl. forward+metric; "
        f"mIoU={float(miou):.4f} [synthetic labels ~ 1/C])",
        flush=True,
    )
    print("phase stats:", ev.timer.summary(), flush=True)


if __name__ == "__main__":
    main()
