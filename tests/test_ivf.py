"""IVF (leaf-partitioned approximate kNN) core machinery.

Covers: capacity-balanced layout invariants, spherical k-means sanity,
XLA-path vs brute-force-over-scanned-slabs equality, Pallas(interpret)
vs XLA equality, end-to-end recall on a clustered bank, int8 parity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hbird_tpu.ops.ivf import (
    ivf_search,
    assign_leaves,
    balanced_layout,
    build_ivf_arrays,
    ivf_search_xla,
    pallas_ivf_knn,
    select_block_leaves,
    train_centroids,
    tree_layout,
)


def mixture_bank(m, d, n_clusters, seed=0, noise=0.08):
    """Unit-norm rows around n_clusters random directions (the geometry
    IVF assumes — patch embeddings cluster by semantic class)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    who = rng.integers(0, n_clusters, m)
    x = centers[who] + noise * rng.normal(size=(m, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32), who


class TestLayout:
    def test_balanced_layout_invariants(self):
        rng = np.random.default_rng(1)
        m, n_leaves, cap = 1000, 8, 256
        choices = rng.integers(0, n_leaves, (m, 3)).astype(np.int32)
        slots, fill = balanced_layout(choices, n_leaves, cap)
        # every row placed, all slots unique and in range
        assert (slots >= 0).all() and (slots < n_leaves * cap).all()
        assert len(np.unique(slots)) == m
        # leaves filled contiguously from 0: slot-within-leaf < fill[leaf]
        leaf = slots // cap
        within = slots % cap
        assert (within < fill[leaf]).all()
        assert fill.sum() == m
        assert (fill <= cap).all()

    def test_best_choice_honored_when_room(self):
        # capacity ample -> every row lands in its first choice
        choices = np.array([[0, 1], [1, 0], [2, 0], [0, 2]], np.int32)
        slots, fill = balanced_layout(choices, 3, 256)
        assert ((slots // 256) == choices[:, 0]).all()

    def test_overflow_spills_to_next_choice(self):
        # leaf 0 has room for 256; 300 rows prefer it -> 44 go to choice 2
        choices = np.zeros((300, 2), np.int32)
        choices[:, 1] = 1
        slots, fill = balanced_layout(choices, 2, 256)
        assert fill[0] == 256 and fill[1] == 44

    def test_tree_layout_covers(self):
        n_leaves, cap = tree_layout(10_000, 16)
        assert n_leaves * cap >= 10_000
        assert cap % 256 == 0


class TestKMeans:
    def test_recovers_clusters(self):
        x, who = mixture_bank(4096, 32, 8, seed=2)
        c = train_centroids(jnp.asarray(x), 8, iters=15,
                            key=jax.random.PRNGKey(3))
        a = np.asarray(jnp.argmax(jnp.asarray(x) @ c.T, axis=1))
        # cluster purity: each true cluster maps dominantly to one leaf
        purity = 0
        for t in range(8):
            ids, counts = np.unique(a[who == t], return_counts=True)
            purity += counts.max()
        assert purity / len(x) > 0.9


def _build(x, n_leaves, cap, labels=None):
    c = train_centroids(jnp.asarray(x[: min(len(x), 4096)]), n_leaves,
                        iters=10, key=jax.random.PRNGKey(0))
    choices = assign_leaves(jnp.asarray(x), c, n_choices=3)
    slots, fill = balanced_layout(choices, n_leaves, cap)
    ivf_bank, ivf_labels, perm = build_ivf_arrays(
        jnp.asarray(x), labels, slots, n_leaves, cap
    )
    return c, ivf_bank, ivf_labels, perm, jnp.asarray(fill, jnp.int32)


class TestSearch:
    def setup_method(self, _):
        # 12 leaves over 6 clusters: leaves are sub-cluster sized, the
        # regime IVF actually runs in (e.g. 512 leaves over ~20 semantic
        # classes at 1M rows).
        self.x, _ = mixture_bank(6000, 32, 6, seed=4)
        self.n_leaves, self.cap = tree_layout(len(self.x), 12)
        (self.c, self.ivf_bank, _, self.perm,
         self.leaf_valid) = _build(self.x, self.n_leaves, self.cap)
        rng = np.random.default_rng(5)
        q = self.x[rng.integers(0, len(self.x), 512)] + 0.02 * rng.normal(
            size=(512, 32)
        )
        self.q = jnp.asarray(q.astype(np.float32))

    def test_xla_matches_bruteforce_over_scanned(self):
        block_q, n_probe, k = 64, 3, 10
        lids = select_block_leaves(self.q, self.c, n_probe, block_q)
        vals, idx = ivf_search_xla(
            self.q, self.ivf_bank, lids, self.leaf_valid, k, cap=self.cap
        )
        # brute force: for each tile, top-k over exactly the scanned slabs
        bank3 = np.asarray(self.ivf_bank).reshape(-1, self.cap, 32)
        lv = np.asarray(self.leaf_valid)
        qn = np.asarray(self.q)
        for t in range(qn.shape[0] // block_q):
            slabs = np.asarray(lids)[t]
            rows = []
            cols = []
            for s in slabs:
                rows.append(bank3[s][: lv[s]])
                cols.append(np.arange(s * self.cap, s * self.cap + lv[s]))
            cat = np.concatenate(rows)
            gcol = np.concatenate(cols)
            scores = qn[t * block_q : (t + 1) * block_q] @ cat.T
            exp = np.sort(scores, axis=1)[:, -k:][:, ::-1]
            got = np.asarray(vals)[t * block_q : (t + 1) * block_q]
            np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)
            # indices point at rows with the same scores
            got_idx = np.asarray(idx)[t * block_q : (t + 1) * block_q]
            assert np.isin(got_idx, gcol).all()

    def test_pallas_interpret_matches_xla(self):
        block_q, n_probe, k = 64, 3, 10
        lids = select_block_leaves(self.q, self.c, n_probe, block_q)
        v1, i1 = ivf_search_xla(
            self.q, self.ivf_bank, lids, self.leaf_valid, k, cap=self.cap
        )
        v2, i2 = pallas_ivf_knn(
            self.q, self.ivf_bank, lids, self.leaf_valid, k,
            cap=self.cap, block_q=block_q,
        )
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
        # equal scores can order differently; compare neighbour SETS by value
        np.testing.assert_allclose(
            np.sort(np.asarray(v1), axis=1), np.sort(np.asarray(v2), axis=1),
            rtol=1e-5,
        )

    def _recall(self, idx):
        orig_idx = np.asarray(self.perm)[np.asarray(idx)]
        assert (orig_idx >= 0).all()  # never a padding slot
        k = orig_idx.shape[1]
        exact = np.asarray(self.q) @ self.x.T
        exact_idx = np.argsort(-exact, axis=1)[:, :k]
        return np.mean([
            len(set(orig_idx[i]) & set(exact_idx[i])) / k
            for i in range(len(orig_idx))
        ])

    def test_recall_vs_exact(self):
        # Query-grouped search (the production path). Measured coverage
        # curve on this fixture: n_probe 4 -> 0.91, 5 -> 0.97, 6 -> 0.98,
        # 8 -> 0.999 — n_probe is the recall/cost knob, exactly ScaNN's
        # num_leaves_to_search semantics. 6/12 leaves still halves the
        # scan; real geometries (512+ leaves, huge Q) probe far smaller
        # fractions because sorted tiles are much more leaf-coherent.
        vals, idx = ivf_search(
            self.q, self.ivf_bank, self.c, self.leaf_valid, 10,
            cap=self.cap, n_probe=6, block_q=64, kernel="xla",
        )
        assert self._recall(idx) > 0.95, self._recall(idx)

    def test_query_grouping_lifts_recall(self):
        # The same probe budget WITHOUT grouping is measurably worse on
        # cluster-mixed query order — pinning why sort_queries exists.
        _, idx_nosort = ivf_search(
            self.q, self.ivf_bank, self.c, self.leaf_valid, 10,
            cap=self.cap, n_probe=4, block_q=64, kernel="xla",
            sort_queries=False,
        )
        _, idx_sort = ivf_search(
            self.q, self.ivf_bank, self.c, self.leaf_valid, 10,
            cap=self.cap, n_probe=4, block_q=64, kernel="xla",
        )
        assert self._recall(idx_sort) > self._recall(idx_nosort)

    def test_ragged_query_count(self):
        # Q not a multiple of block_q: pad/unpad must be invisible.
        q = self.q[:100]
        vals, idx = ivf_search(
            q, self.ivf_bank, self.c, self.leaf_valid, 5,
            cap=self.cap, n_probe=4, block_q=64, kernel="xla",
        )
        assert vals.shape == (100, 5) and idx.shape == (100, 5)
        assert np.isfinite(np.asarray(vals)).all()

    def test_int8_parity(self):
        block_q, n_probe, k = 64, 3, 10
        scale = np.abs(self.x).max() / 127.0
        bank8 = np.clip(np.round(np.asarray(self.ivf_bank) / scale),
                        -127, 127).astype(np.int8)
        q_scale = np.abs(np.asarray(self.q)).max() / 127.0
        q8 = np.clip(np.round(np.asarray(self.q) / q_scale),
                     -127, 127).astype(np.int8)
        lids = select_block_leaves(self.q, self.c, n_probe, block_q)
        v_x, i_x = ivf_search_xla(
            jnp.asarray(q8), jnp.asarray(bank8), lids, self.leaf_valid, k,
            cap=self.cap,
        )
        v_p, i_p = pallas_ivf_knn(
            jnp.asarray(q8), jnp.asarray(bank8), lids, self.leaf_valid, k,
            cap=self.cap, block_q=block_q,
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(v_x)), np.sort(np.asarray(v_p)), rtol=1e-6
        )
        # quantized scores track the f32 ordering closely on this data
        v_f, _ = ivf_search_xla(
            self.q, self.ivf_bank, lids, self.leaf_valid, k, cap=self.cap
        )
        top1_q = np.asarray(i_x)[:, 0]
        top1_f = np.asarray(
            ivf_search_xla(self.q, self.ivf_bank, lids, self.leaf_valid, 1,
                           cap=self.cap)[1]
        )[:, 0]
        assert (top1_q == top1_f).mean() > 0.9


class TestBackend:
    """NearestNeighborSearchApprox(use_tree=True) — ScaNN tree() surface."""

    def setup_method(self, _):
        self.x, _ = mixture_bank(4000, 32, 5, seed=7)
        rng = np.random.default_rng(8)
        self.labels = rng.random((4000, 6)).astype(np.float32)
        q = self.x[rng.integers(0, 4000, 300)] + 0.02 * rng.normal(
            size=(300, 32)
        )
        self.q = jnp.asarray(q.astype(np.float32))

    def _mk(self, **kw):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        kw.setdefault("num_leaves", 10)
        kw.setdefault("num_leaves_to_search", 5)
        kw.setdefault("query_block", 64)
        return NearestNeighborSearchApprox(
            self.x, n_neighbors=10, label_memory=jnp.asarray(self.labels),
            use_tree=True, **kw,
        )

    def test_search_recall_and_labels(self):
        nn = self._mk()
        vals, idx, labs = nn.search_with_labels(self.q, 10)
        idx = np.asarray(idx)
        assert (idx >= 0).all() and (idx < 4000).all()
        # labels gathered consistently with the returned original ids
        np.testing.assert_allclose(
            np.asarray(labs), self.labels[idx], atol=1e-6
        )
        exact = np.asarray(self.q) @ self.x.T
        exact_idx = np.argsort(-exact, axis=1)[:, :10]
        recall = np.mean([
            len(set(idx[i]) & set(exact_idx[i])) / 10 for i in range(len(idx))
        ])
        assert recall > 0.9, recall

    def test_find_nearest_neighbors_api(self):
        nn = self._mk()
        idx, vals = nn.find_nearest_neighbors(np.asarray(self.q)[:64], 5)
        assert idx.shape == (64, 5) and vals.shape == (64, 5)

    def test_reorder_rescoring(self):
        # reorder(C) exact re-scoring: f32 scores of the returned rows
        # must equal the true dot products (bf16 store -> small atol).
        nn = self._mk(num_reordering_candidates=30)
        vals, idx, _ = nn.search_with_labels(self.q, 10)
        got = np.asarray(vals)
        idx = np.asarray(idx)
        true = np.take_along_axis(
            np.asarray(self.q) @ np.asarray(
                np.asarray(jnp.asarray(self.x, jnp.bfloat16), np.float32)
            ).T,
            idx, axis=1,
        )
        np.testing.assert_allclose(got, true, atol=1e-5, rtol=1e-5)

    def test_state_spec_matches_real_state(self):
        # The AOT contract: a dummy-config backend pinned to the real row
        # count must spec the REAL backend's device_state exactly.
        nn = self._mk()
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        dummy = NearestNeighborSearchApprox(
            np.zeros((2, 32), np.float32), n_neighbors=10,
            label_memory=np.zeros((2, 6), np.float32), use_tree=True,
            num_leaves=10, num_leaves_to_search=5, query_block=64,
        )
        dummy.pin_expected_rows(4000)
        spec = dummy.state_spec(4000)
        real = nn.device_state
        assert set(spec) == set(real)
        for key in real:
            assert tuple(spec[key].shape) == tuple(real[key].shape), key
            assert spec[key].dtype == real[key].dtype, key

    def test_int8_tree_backend(self):
        nn8 = self._mk(use_int8=True)
        vals8, idx8, labs8 = nn8.search_with_labels(self.q, 10)
        nnf = self._mk()
        valsf, idxf, _ = nnf.search_with_labels(self.q, 10)
        # quantized ordering tracks the bf16 ordering closely
        overlap = np.mean([
            len(set(np.asarray(idx8)[i]) & set(np.asarray(idxf)[i])) / 10
            for i in range(idx8.shape[0])
        ])
        assert overlap > 0.85, overlap
        # rescaled scores approximate true dot products
        true = np.take_along_axis(
            np.asarray(self.q) @ self.x.T, np.asarray(idx8), axis=1
        )
        np.testing.assert_allclose(np.asarray(vals8), true, atol=0.05)

    def test_int8_injection_requires_scale(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        scale = float(np.abs(self.x).max() / 127.0)
        bank8 = jnp.asarray(
            np.clip(np.round(self.x / scale), -127, 127).astype(np.int8)
        )
        with pytest.raises(AssertionError):
            NearestNeighborSearchApprox(
                bank8, n_neighbors=10, use_tree=True, use_int8=True,
                num_leaves=10, num_leaves_to_search=5, query_block=64,
                label_memory=jnp.asarray(self.labels),
            )
        nn = NearestNeighborSearchApprox(
            bank8, n_neighbors=10, use_tree=True, use_int8=True,
            bank_scale=scale, num_leaves=10, num_leaves_to_search=5,
            query_block=64, label_memory=jnp.asarray(self.labels),
        )
        vals, idx, _ = nn.search_with_labels(self.q, 10)
        assert (np.asarray(idx) >= 0).all()

    def test_meshed_tree_search(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
        from hbird_tpu.parallel import make_mesh

        mesh = make_mesh((4,), ("bank",))
        nn = NearestNeighborSearchApprox(
            self.x, n_neighbors=10, label_memory=jnp.asarray(self.labels),
            use_tree=True, mesh=mesh, num_leaves=12, num_leaves_to_search=6,
            query_block=64,
        )
        assert nn.use_tree and nn._n_leaves % 4 == 0
        vals, idx, labs = nn.search_with_labels(self.q, 10)
        idx = np.asarray(idx)
        assert (idx >= 0).all() and (idx < len(self.x)).all()
        # labels merged by masked psum == labels of the returned rows
        np.testing.assert_allclose(
            np.asarray(labs), self.labels[idx], atol=1e-6
        )
        exact = np.asarray(self.q) @ self.x.T
        exact_idx = np.argsort(-exact, axis=1)[:, :10]
        recall = np.mean([
            len(set(idx[i]) & set(exact_idx[i])) / 10 for i in range(len(idx))
        ])
        assert recall > 0.85, recall

    def test_meshed_vs_unmeshed_values_sane(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
        from hbird_tpu.parallel import make_mesh

        mesh = make_mesh((4,), ("bank",))
        kw = dict(n_neighbors=10, use_tree=True, num_leaves=12,
                  num_leaves_to_search=6, query_block=64,
                  label_memory=jnp.asarray(self.labels))
        nn_m = NearestNeighborSearchApprox(self.x, mesh=mesh, **kw)
        nn_1 = NearestNeighborSearchApprox(self.x, **kw)
        _, i_m, _ = nn_m.search_with_labels(self.q, 10)
        _, i_1, _ = nn_1.search_with_labels(self.q, 10)
        # The shortlists differ (global top-6 vs per-shard top-2 x 4),
        # so compare what matters: recall against the exact oracle. The
        # forced per-shard spread probes 8 leaves for the same budget,
        # so the meshed path must not trail the single-device one.
        exact = np.asarray(self.q) @ self.x.T
        exact_idx = np.argsort(-exact, axis=1)[:, :10]

        def recall(idx):
            idx = np.asarray(idx)
            return np.mean([
                len(set(idx[i]) & set(exact_idx[i])) / 10
                for i in range(len(idx))
            ])

        # The per-shard spread probes 8 leaves total but only 2 per shard;
        # when one shard holds >2 relevant leaves it can trail the global
        # top-6 slightly. Anything beyond a few points would mean a merge
        # bug rather than shortlist geometry.
        assert recall(i_m) >= recall(i_1) - 0.05, (recall(i_m), recall(i_1))


class TestEngineIVF:
    def test_engine_ivf_matches_exact(self, tmp_path):
        import random

        from hbird_tpu import HbirdEvaluation
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.synthetic import make_voc_fixture
        from hbird_tpu.data.transforms import (
            get_hbird_train_transforms,
            get_hbird_val_transforms,
        )
        from hbird_tpu.models import FeatureExtractorSimple

        INPUT, PATCH = 32, 4
        S = INPUT // PATCH

        def oracle_fn(model, imgs):
            b, c, h, w = imgs.shape
            s = h // PATCH
            xm = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
            return xm.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

        root = str(tmp_path / "voc")
        make_voc_fixture(root, n_train=8, n_val=4, size=(48, 40),
                         colorize=True, seed=5, class_pool=[1, 2, 3])

        def run(nn_method, nn_params=None):
            random.seed(321)
            tt = get_hbird_train_transforms(INPUT, device_normalize=True)
            vt = get_hbird_val_transforms(INPUT, device_normalize=True)
            ds, ign = get_dataset("voc", root, 4, 0, tt, vt, None, None)
            fe = FeatureExtractorSimple(
                None, ftr_extr_fn=oracle_fn, eval_spatial_resolution=S,
                d_model=3,
            )
            ev = HbirdEvaluation(
                fe, ds.train_dataloader(), num_classes=ds.get_num_classes(),
                n_neighbours=5, nn_method=nn_method, nn_params=nn_params,
                dataset_size=ds.get_train_dataset_size(),
                device_norm=tt.get("device_norm"),
            )
            return float(ev.evaluate(ds.val_dataloader(), S, ignore_index=ign))

        m_exact = run("exact")
        # generous probe budget on the tiny fixture: same result as exact
        m_ivf = run("ivf", dict(num_leaves=4, num_leaves_to_search=4,
                                query_block=64))
        assert abs(m_ivf - m_exact) < 0.02, (m_ivf, m_exact)



class TestPriorityPlacement:
    def test_overfull_leaf_keeps_strongest(self):
        # 300 rows prefer leaf 0 (cap 256) with rising scores; the 44
        # weakest must be the ones spilled to their second choice.
        choices = np.zeros((300, 2), np.int32)
        choices[:, 1] = 1
        scores = np.stack(
            [np.arange(300, dtype=np.float32),
             np.zeros(300, np.float32)], axis=1,
        )
        slots, fill = balanced_layout(choices, 2, 256, scores=scores)
        leaf = slots // 256
        assert fill[0] == 256 and fill[1] == 44
        assert (leaf[:44] == 1).all()      # weakest 44 spilled
        assert (leaf[44:] == 0).all()      # strongest 256 kept

    def test_assign_scores_match_choices(self):
        x, _ = mixture_bank(2000, 16, 4, seed=9)
        c = train_centroids(jnp.asarray(x), 4, iters=8)
        ids, sc = assign_leaves(jnp.asarray(x), c, n_choices=2,
                                return_scores=True)
        full = x @ np.asarray(c).T
        np.testing.assert_allclose(
            sc, np.take_along_axis(full, ids, axis=1), atol=1e-5
        )
        assert (sc[:, 0] >= sc[:, 1]).all()


class TestRefinement:
    def test_refine_reduces_spill(self):
        from hbird_tpu.ops.ivf import refine_centroids_balanced

        # Unbalanced mixture: one dominant cluster overflows its leaf
        # under plain k-means; refinement must cut off-best-leaf rows.
        rng = np.random.default_rng(11)
        centers = rng.normal(size=(4, 24)); centers /= np.linalg.norm(
            centers, axis=1, keepdims=True)
        who = rng.choice(4, 6000, p=[0.55, 0.15, 0.15, 0.15])
        noise = rng.normal(size=(6000, 24)); noise *= 0.3 / np.linalg.norm(
            noise, axis=1, keepdims=True)
        x = (centers[who] + noise).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        n_leaves, cap = tree_layout(6000, 8, slack=1.1)
        c0 = train_centroids(jnp.asarray(x), n_leaves, iters=10)

        def spill(c):
            ch, sc = assign_leaves(jnp.asarray(x), c, n_choices=3,
                                   return_scores=True)
            slots, _ = balanced_layout(ch, n_leaves, cap, scores=sc)
            return float((ch[:, 0] != (slots // cap)).mean())

        c1 = refine_centroids_balanced(jnp.asarray(x), c0, slack=1.1,
                                       rounds=3)
        assert spill(c1) <= spill(c0) + 1e-9, (spill(c0), spill(c1))


class TestLayoutFuzz:
    def test_invariants_across_random_geometries(self):
        # balanced_layout must uphold its invariants for any (M, leaves,
        # cap, choices, scores) with n_leaves*cap >= M.
        for seed in range(12):
            rng = np.random.default_rng(seed)
            n_leaves = int(rng.integers(1, 20))
            m = int(rng.integers(1, 3000))
            cap = int(np.ceil(m / n_leaves * rng.uniform(1.0, 2.0)))
            a = int(rng.integers(1, 4))
            choices = rng.integers(0, n_leaves, (m, a)).astype(np.int32)
            scores = (
                rng.normal(size=(m, a)).astype(np.float32)
                if rng.random() < 0.5 else None
            )
            slots, fill = balanced_layout(choices, n_leaves, cap,
                                          scores=scores)
            assert (slots >= 0).all() and (slots < n_leaves * cap).all(), seed
            assert len(np.unique(slots)) == m, seed
            leaf = slots // cap
            within = slots % cap
            assert (within < fill[leaf]).all(), seed
            assert fill.sum() == m and (fill <= cap).all(), seed


class TestFromTreeState:
    """from_tree_state: prebuilt-slab injection must search identically
    to the backend that built the slabs (streamed-build entry point)."""

    def test_matches_builder_backend(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        x, _ = mixture_bank(3000, 32, 5, seed=17)
        rng = np.random.default_rng(18)
        labels = rng.random((3000, 6)).astype(np.float32)
        q = jnp.asarray(x[rng.integers(0, 3000, 128)])
        built = NearestNeighborSearchApprox(
            x, n_neighbors=10, label_memory=jnp.asarray(labels),
            use_tree=True, num_leaves=10, num_leaves_to_search=5,
            query_block=64,
        )
        injected = NearestNeighborSearchApprox.from_tree_state(
            built.bank, built.labels, built.centroids, built.leaf_valid,
            np.asarray(built.perm), np.asarray(built.slots),
            cap=built._cap, valid_rows=built.valid_rows, n_neighbors=10,
            num_leaves=10, num_leaves_to_search=5, query_block=64,
            use_int8=False,
        )
        v1, i1, l1 = built.search_with_labels(q, 10)
        v2, i2, l2 = injected.search_with_labels(q, 10)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)
        # AOT contract: the injected backend's state must match its spec.
        spec = injected.state_spec(3000)
        real = injected.device_state
        assert set(spec) == set(real)
        for key in real:
            assert tuple(spec[key].shape) == tuple(real[key].shape), key


class TestStreamedBuild:
    """build_tree_streamed / from_bankdir: the streamed three-pass build
    must match a flat build's search results (same layout greedy)."""

    def test_stream_matches_flat_build(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
        from hbird_tpu.ops.ivf import build_tree_streamed

        x, _ = mixture_bank(3000, 32, 5, seed=21)
        rng = np.random.default_rng(22)
        labels = rng.random((3000, 6)).astype(np.float32)
        q = jnp.asarray(x[rng.integers(0, 3000, 128)])

        def stream():
            for i in range(0, 3000, 700):  # ragged blocks
                yield x[i:i + 700], labels[i:i + 700]

        parts = build_tree_streamed(stream, 3000, 10, slack=1.3, seed=0)
        nn = NearestNeighborSearchApprox.from_tree_state(
            parts["ivf_bank"], parts["ivf_labels"], parts["centroids"],
            parts["leaf_fill"], parts["perm"], parts["slots"],
            cap=parts["cap"], valid_rows=3000, n_neighbors=10,
            num_leaves=10, num_leaves_to_search=5, query_block=64,
            use_int8=False,
        )
        _, idx, labs = nn.search_with_labels(q, 10)
        idx = np.asarray(idx)
        assert (idx >= 0).all() and (idx < 3000).all()
        np.testing.assert_allclose(np.asarray(labs), labels[idx], atol=1e-6)
        exact_idx = np.argsort(-(np.asarray(q) @ x.T), axis=1)[:, :10]
        recall = np.mean([
            len(set(idx[i]) & set(exact_idx[i])) / 10 for i in range(len(idx))
        ])
        assert recall > 0.85, recall

    def test_from_bankdir(self, tmp_path):
        from hbird_tpu.bank.io import save_memory_sharded
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        x, _ = mixture_bank(2500, 32, 4, seed=23)
        rng = np.random.default_rng(24)
        labels = rng.random((2500, 5)).astype(np.float32)
        f_dir = str(tmp_path / "feats.bankdir")
        l_dir = str(tmp_path / "labs.bankdir")
        # different chunkings on purpose
        save_memory_sharded(x, f_dir, chunk_rows=600)
        save_memory_sharded(labels, l_dir, chunk_rows=900)
        nn = NearestNeighborSearchApprox.from_bankdir(
            f_dir, l_dir, n_neighbors=10, window_rows=800,
            num_leaves=8, num_leaves_to_search=4, query_block=64,
            use_int8=False,
        )
        assert nn.valid_rows == 2500
        q = jnp.asarray(x[rng.integers(0, 2500, 100)])
        _, idx, labs = nn.search_with_labels(q, 10)
        idx = np.asarray(idx)
        assert (idx >= 0).all() and (idx < 2500).all()
        np.testing.assert_allclose(np.asarray(labs), labels[idx], atol=1e-6)

    def test_from_bankdir_meshed_matches_unmeshed(self, tmp_path):
        """VERDICT r4 item 5: a .bankdir streams straight onto a MESH —
        each disk window scatters to its owning shard, the tree comes out
        leaf-sharded, and both the layout and full-probe search equal the
        unmeshed streamed oracle bit-for-bit. Windows (700 rows) exceed
        any single shard's nominal share (3000/8 = 375 rows), so windows
        genuinely split across shards."""
        from hbird_tpu.bank.io import save_memory_sharded
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
        from hbird_tpu.parallel import make_mesh

        mesh = make_mesh((8,), ("bank",))
        x, _ = mixture_bank(3000, 32, 5, seed=41)
        rng = np.random.default_rng(42)
        labels = rng.random((3000, 6)).astype(np.float32)
        f_dir = str(tmp_path / "mfeats.bankdir")
        l_dir = str(tmp_path / "mlabs.bankdir")
        save_memory_sharded(x, f_dir, chunk_rows=650)
        save_memory_sharded(labels, l_dir, chunk_rows=800)
        kwargs = dict(
            n_neighbors=10, window_rows=700, num_leaves=8,
            num_leaves_to_search=8, query_block=64, use_int8=False,
            use_fp16=False,  # f32 store: full probe == the f32 oracle
        )
        nn_m = NearestNeighborSearchApprox.from_bankdir(
            f_dir, l_dir, mesh=mesh, **kwargs
        )
        nn_s = NearestNeighborSearchApprox.from_bankdir(f_dir, l_dir, **kwargs)

        # The meshed tree is genuinely leaf-sharded over all 8 devices.
        assert len(nn_m.bank.sharding.device_set) == 8
        shard_rows = {sh.data.shape[0] for sh in nn_m.bank.addressable_shards}
        assert shard_rows == {nn_m.bank.shape[0] // 8}, shard_rows

        # Same geometry and bit-identical layout as the unmeshed build.
        assert nn_m._cap == nn_s._cap and nn_m._n_leaves == nn_s._n_leaves
        np.testing.assert_array_equal(np.asarray(nn_m.slots), np.asarray(nn_s.slots))
        np.testing.assert_array_equal(np.asarray(nn_m.perm), np.asarray(nn_s.perm))
        np.testing.assert_array_equal(np.asarray(nn_m.bank), np.asarray(nn_s.bank))
        np.testing.assert_array_equal(
            np.asarray(nn_m.labels), np.asarray(nn_s.labels)
        )

        # Full-probe meshed search == unmeshed == exact.
        q = jnp.asarray(x[rng.integers(0, 3000, 96)])
        _, idx_m, labs_m = nn_m.search_with_labels(q, 10)
        _, idx_s, _ = nn_s.search_with_labels(q, 10)
        np.testing.assert_array_equal(np.asarray(idx_m), np.asarray(idx_s))
        idx_m = np.asarray(idx_m)
        exact_idx = np.argsort(-(np.asarray(q) @ x.T), axis=1)[:, :10]
        assert (idx_m == exact_idx).mean() > 0.99
        np.testing.assert_allclose(
            np.asarray(labs_m), labels[idx_m], atol=1e-6
        )

    def test_from_bankdir_bfloat16(self, tmp_path):
        """A bf16 .bankdir streams into the tree build (np.save stores
        bf16 as raw void bytes; iter_memory_chunks bit-views them back —
        this crashed with 'No cast function available' before)."""
        from hbird_tpu.bank.io import save_memory_sharded
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        x, _ = mixture_bank(2000, 32, 4, seed=31)
        f_dir = str(tmp_path / "feats16.bankdir")
        save_memory_sharded(jnp.asarray(x, jnp.bfloat16), f_dir,
                            chunk_rows=700)
        nn = NearestNeighborSearchApprox.from_bankdir(
            f_dir, None, n_neighbors=10, window_rows=600,
            num_leaves=8, num_leaves_to_search=8, query_block=64,
            use_int8=False,
        )
        assert nn.bank.dtype == jnp.bfloat16 and nn.valid_rows == 2000
        rng = np.random.default_rng(32)
        q = jnp.asarray(x[rng.integers(0, 2000, 100)])
        _, idx, _ = nn.search_with_labels(q, 10)
        idx = np.asarray(idx)
        # Full probe == exact search modulo bf16 rounding: top-1 must be
        # the query row itself.
        exact_top1 = np.argmax(np.asarray(q) @ x.T, axis=1)
        assert (idx[:, 0] == exact_top1).mean() > 0.95


class TestEngineBankdirStreamedLoad:
    def test_load_memory_bankdir_ivf_streams(self, tmp_path):
        from hbird_tpu.bank.io import save_memory_sharded
        from hbird_tpu.hbird_eval import HbirdEvaluation

        x, _ = mixture_bank(2000, 16, 4, seed=29)
        rng = np.random.default_rng(30)
        labels = rng.random((2000, 5)).astype(np.float32)
        f_p = str(tmp_path / "f.bankdir")
        l_p = str(tmp_path / "l.bankdir")
        save_memory_sharded(x, f_p, chunk_rows=512)
        save_memory_sharded(labels, l_p, chunk_rows=512)

        ev = HbirdEvaluation.__new__(HbirdEvaluation)
        ev.f_mem_p, ev.l_mem_p = f_p, l_p
        ev.n_neighbours = 5
        ev.nn_method = "ivf"
        ev.nn_params = {"num_leaves": 8, "num_leaves_to_search": 4,
                        "query_block": 64, "use_int8": False}
        ev.num_classes = 5
        ev.memory_size = None
        ev.mesh = None
        ev.bf16_bank = False
        assert ev.load_memory() is True
        # streamed: no flat memory was materialized
        assert ev.feature_memory is None
        nn = ev.NN_algorithm
        assert nn.use_tree and nn.valid_rows == 2000
        q = jnp.asarray(x[rng.integers(0, 2000, 64)])
        _, idx, labs = nn.search_with_labels(q, 5)
        idx = np.asarray(idx)
        assert (idx >= 0).all() and (idx < 2000).all()
        np.testing.assert_allclose(np.asarray(labs), labels[idx], atol=1e-6)

    def test_load_memory_bankdir_ivf_streams_meshed(self, tmp_path):
        """The engine's streamed .bankdir load works WITH a mesh (the
        round-4 gate `mesh is None` is gone): the backend comes out
        leaf-sharded with no flat memory held."""
        from hbird_tpu.bank.io import save_memory_sharded
        from hbird_tpu.hbird_eval import HbirdEvaluation
        from hbird_tpu.parallel import make_mesh

        mesh = make_mesh((8,), ("bank",))
        x, _ = mixture_bank(2000, 16, 4, seed=33)
        rng = np.random.default_rng(34)
        labels = rng.random((2000, 5)).astype(np.float32)
        f_p = str(tmp_path / "fm.bankdir")
        l_p = str(tmp_path / "lm.bankdir")
        save_memory_sharded(x, f_p, chunk_rows=512)
        save_memory_sharded(labels, l_p, chunk_rows=512)

        ev = HbirdEvaluation.__new__(HbirdEvaluation)
        ev.f_mem_p, ev.l_mem_p = f_p, l_p
        ev.n_neighbours = 5
        ev.nn_method = "ivf"
        ev.nn_params = {"num_leaves": 8, "num_leaves_to_search": 8,
                        "query_block": 64, "use_int8": False}
        ev.num_classes = 5
        ev.memory_size = None
        ev.mesh = mesh
        ev.bf16_bank = False
        assert ev.load_memory() is True
        assert ev.feature_memory is None
        nn = ev.NN_algorithm
        assert nn.use_tree and nn.valid_rows == 2000
        assert len(nn.bank.sharding.device_set) == 8
        q = jnp.asarray(x[rng.integers(0, 2000, 64)])
        _, idx, labs = nn.search_with_labels(q, 5)
        idx = np.asarray(idx)
        # Full probe through the meshed tree ~= exact search (the engine
        # path stores bf16, so near-tied neighbours may swap ranks; the
        # top-1 is robust — same bar as the unmeshed bf16 test).
        exact_top1 = np.argmax(np.asarray(q) @ x.T, axis=1)
        assert (idx[:, 0] == exact_top1).mean() > 0.95
        np.testing.assert_allclose(np.asarray(labs), labels[idx], atol=1e-6)


class TestProbeCalibration:
    """calibrate_n_probe: measured recall-targeted selection of
    num_leaves_to_search (the ScaNN-builder-style recall knob, done by
    direct measurement against the full-probe oracle)."""

    def test_monotone_and_meets_target(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        x, _ = mixture_bank(6000, 32, 24, seed=37)
        rng = np.random.default_rng(38)
        nn = NearestNeighborSearchApprox(
            x, n_neighbors=10, use_tree=True, num_leaves=24,
            num_leaves_to_search=24, query_block=64,
            label_memory=jnp.asarray(rng.random((6000, 4)).astype(np.float32)),
        )
        p_low = nn.calibrate_n_probe(0.85, n_queries=1024, seed=1)
        p_high = nn.calibrate_n_probe(0.999, n_queries=1024, seed=1)
        assert 1 <= p_low <= p_high <= 24, (p_low, p_high)
        assert nn.num_leaves_to_search == p_high
        # The calibrated probe meets the target on the calibration draw.
        from hbird_tpu.ops.ivf import ivf_search

        rows = jnp.take(
            nn.slots,
            jnp.asarray(np.random.default_rng(1).choice(6000, 1024,
                                                        replace=False)),
            axis=0,
        )
        q = jnp.take(nn.bank, rows, axis=0)

        def run(p):
            _, idx = ivf_search(
                q, nn.bank, nn.centroids, nn.leaf_valid, 10,
                cap=nn._cap, n_probe=p, block_q=64,
            )
            return np.asarray(idx)

        oracle = run(24)
        got = run(p_high)
        recall = np.mean([
            len(set(got[i]) & set(oracle[i])) / 10 for i in range(1024)
        ])
        assert recall >= 0.999, recall

    def test_requires_tree(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        x, _ = mixture_bank(2000, 16, 4, seed=39)
        flat = NearestNeighborSearchApprox(x, n_neighbors=5)
        with pytest.raises(AssertionError):
            flat.calibrate_n_probe(0.9)

    def test_calibrates_under_runtime_probe_mode(self):
        """A probe_mode='query' backend must calibrate under per-query
        probing: tile probing under-reads recall on iid calibration
        queries (shortlist dilution), which would inflate n_probe far
        beyond what the per-query runtime path needs."""
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        x, _ = mixture_bank(6000, 32, 24, seed=41, noise=0.05)

        def calibrated(mode):
            nn = NearestNeighborSearchApprox(
                x, n_neighbors=10, use_tree=True, num_leaves=24,
                num_leaves_to_search=24, query_block=64, probe_mode=mode,
            )
            return nn.calibrate_n_probe(0.9, n_queries=512, seed=2)

        p_query = calibrated("query")
        p_tile = calibrated("tile")
        # Per-query probing reaches the target with at most as many
        # probed leaves (strictly fewer in the diluted regime).
        assert 1 <= p_query <= p_tile <= 24, (p_query, p_tile)

    def test_meshed_calibration_through_sharded_path(self):
        """Meshed trees calibrate through the REAL sharded search
        (shard_probe semantics): the full-probe oracle is exact per
        shard, so a recall_target of 1.0 must land on a probe count
        whose sharded recall measures 1.0 — and the chosen count is
        installed on the backend."""
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
        from hbird_tpu.parallel import make_mesh

        x, _ = mixture_bank(2000, 16, 4, seed=39)
        meshed = NearestNeighborSearchApprox(
            x, n_neighbors=5, use_tree=True, num_leaves=8,
            num_leaves_to_search=2, query_block=64,
            mesh=make_mesh((4,), ("bank",)),
            label_memory=jnp.asarray(
                np.random.default_rng(0).random((2000, 3)).astype(np.float32)
            ),
        )
        chosen = meshed.calibrate_n_probe(1.0, n_queries=512)
        assert 1 <= chosen <= 8
        assert meshed.num_leaves_to_search == chosen
        # Lower targets can only pick fewer-or-equal probes.
        lower = meshed.calibrate_n_probe(0.5, n_queries=512)
        assert lower <= chosen


class TestEngineIVFMeshed:
    def test_engine_meshed_ivf_matches_single(self, tmp_path):
        """Full engine with a ('data','bank') mesh and nn_method='ivf':
        the tree builds ON the mesh (sharded build) and the evaluation
        must agree with the single-device tree engine."""
        import random

        from hbird_tpu import HbirdEvaluation
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.synthetic import make_voc_fixture
        from hbird_tpu.data.transforms import (
            get_hbird_train_transforms,
            get_hbird_val_transforms,
        )
        from hbird_tpu.models import FeatureExtractorSimple
        from hbird_tpu.parallel import make_mesh

        INPUT, PATCH = 32, 4
        S = INPUT // PATCH

        def oracle_fn(model, imgs):
            b, c, h, w = imgs.shape
            s = h // PATCH
            xm = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
            return xm.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

        root = str(tmp_path / "voc")
        make_voc_fixture(root, n_train=8, n_val=4, size=(48, 40),
                         colorize=True, seed=6, class_pool=[1, 2, 3])
        nn_params = dict(num_leaves=4, num_leaves_to_search=4,
                         query_block=64, shard_probe="full")

        def run(mesh):
            random.seed(432)
            tt = get_hbird_train_transforms(INPUT, device_normalize=True)
            vt = get_hbird_val_transforms(INPUT, device_normalize=True)
            ds, ign = get_dataset("voc", root, 4, 0, tt, vt, None, None)
            fe = FeatureExtractorSimple(
                None, ftr_extr_fn=oracle_fn, eval_spatial_resolution=S,
                d_model=3,
            )
            ev = HbirdEvaluation(
                fe, ds.train_dataloader(), num_classes=ds.get_num_classes(),
                n_neighbours=5, nn_method="ivf", nn_params=nn_params,
                dataset_size=ds.get_train_dataset_size(),
                device_norm=tt.get("device_norm"), mesh=mesh,
            )
            return float(ev.evaluate(ds.val_dataloader(), S, ignore_index=ign))

        m_single = run(None)
        m_meshed = run(make_mesh((2, 4), ("data", "bank")))
        # full per-shard probing + tiny fixture: same retrieval set
        assert abs(m_meshed - m_single) < 0.02, (m_meshed, m_single)


class TestStreamedLoadReviewFixes:
    """Round-3 review follow-ups on the streamed .bankdir load path."""

    def _dirs(self, tmp_path, m=1500, d=16, c=4):
        from hbird_tpu.bank.io import save_memory_sharded

        x, _ = mixture_bank(m, d, 4, seed=43)
        labels = np.random.default_rng(44).random((m, c)).astype(np.float32)
        f_p = str(tmp_path / "f.bankdir")
        l_p = str(tmp_path / "l.bankdir")
        save_memory_sharded(x, f_p, chunk_rows=400)
        save_memory_sharded(labels, l_p, chunk_rows=400)
        return x, labels, f_p, l_p

    def test_f32_bankdir_use_int8_warns_and_casts_bf16(self, tmp_path, caplog):
        import logging

        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        x, labels, f_p, l_p = self._dirs(tmp_path)
        with caplog.at_level(logging.WARNING,
                             logger="hbird_tpu.nn.search_approx"):
            nn = NearestNeighborSearchApprox.from_bankdir(
                f_p, l_p, n_neighbors=5, num_leaves=6,
                num_leaves_to_search=6, query_block=64, use_int8=True,
            )
        assert any("use_int8 ignored" in r.message for r in caplog.records)
        assert nn.bank.dtype == jnp.bfloat16 and not nn.use_int8
        _, idx, _ = nn.search_with_labels(jnp.asarray(x[:32]), 5)
        assert (np.asarray(idx) < 1500).all()

    def test_engine_gate_scann_use_tree(self, tmp_path):
        from hbird_tpu.hbird_eval import HbirdEvaluation

        x, labels, f_p, l_p = self._dirs(tmp_path)
        ev = HbirdEvaluation.__new__(HbirdEvaluation)
        ev.f_mem_p, ev.l_mem_p = f_p, l_p
        ev.n_neighbours = 5
        ev.nn_method = "approx"  # resolved 'scann'
        ev.nn_params = {"use_tree": True, "num_leaves": 6,
                        "num_leaves_to_search": 6, "query_block": 64}
        ev.num_classes = 4
        ev.memory_size = None
        ev.mesh = None
        ev.bf16_bank = False
        assert ev.load_memory() is True
        assert ev.feature_memory is None  # streamed, not flat
        assert ev.NN_algorithm.use_tree

    def test_find_nearest_key_after_streamed_load(self, tmp_path):
        from hbird_tpu.hbird_eval import HbirdEvaluation

        x, labels, f_p, l_p = self._dirs(tmp_path)
        ev = HbirdEvaluation.__new__(HbirdEvaluation)
        ev.f_mem_p, ev.l_mem_p = f_p, l_p
        ev.n_neighbours = 5
        ev.nn_method = "ivf"
        ev.nn_params = {"num_leaves": 6, "num_leaves_to_search": 6,
                        "query_block": 64}
        ev.num_classes = 4
        ev.memory_size = None
        ev.mesh = None
        ev.bf16_bank = False
        assert ev.load_memory() is True
        q = x[:8].reshape(2, 4, 16)
        kf, kl = ev._find_nearest_key_to_query(q)
        assert kf.shape == (2, 4, 5, 16) and kl.shape == (2, 4, 5, 4)
        assert np.isfinite(kf).all()


class TestCalibrationInvalidatesAOT:
    def test_aot_declined_after_calibration(self):
        from hbird_tpu import HbirdEvaluation
        from hbird_tpu.models import FeatureExtractorSimple

        INPUT, PATCH = 32, 4
        S = INPUT // PATCH

        def oracle_fn(model, imgs):
            b, c, h, w = imgs.shape
            s = h // PATCH
            xm = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
            return xm.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

        rng = np.random.default_rng(45)
        imgs = rng.normal(size=(8, 3, INPUT, INPUT)).astype(np.float32)
        ids = (rng.integers(0, 4, (8, 1, INPUT, INPUT)) / 255.0).astype(
            np.float32
        )
        loader = [(imgs[i:i + 4], ids[i:i + 4]) for i in (0, 4)]
        fe = FeatureExtractorSimple(None, oracle_fn,
                                    eval_spatial_resolution=S, d_model=3)

        def build():
            return HbirdEvaluation(
                fe, loader, num_classes=21, n_neighbours=3,
                nn_method="ivf", dataset_size=8,
                nn_params=dict(num_leaves=4, num_leaves_to_search=4,
                               query_block=64),
                aot_eval=dict(batch_size=4, input_size=INPUT,
                              ignore_index=255, img_dtype=np.float32,
                              mask_dtype=np.float32),
            )

        # Control: AOT is picked up when nothing changes.
        ev = build()
        m0 = float(ev.evaluate(loader, S, ignore_index=255))
        assert getattr(ev, "_aot_used", False)

        # Calibration changes the static probe count -> AOT declined,
        # results computed with the calibrated probe via JIT.
        ev2 = build()
        p = ev2.NN_algorithm.calibrate_n_probe(0.5, n_queries=128)
        if p == 4:  # force a different probe count for the test
            ev2.NN_algorithm.num_leaves_to_search = 2
        m1 = float(ev2.evaluate(loader, S, ignore_index=255))
        assert not getattr(ev2, "_aot_used", False)
        assert np.isfinite(m1) and np.isfinite(m0)


class TestEngineRecallTargetCalibration:
    def test_recall_target_nn_param_calibrates(self, caplog):
        import logging

        from hbird_tpu import HbirdEvaluation
        from hbird_tpu.models import FeatureExtractorSimple

        INPUT, PATCH = 32, 4
        S = INPUT // PATCH

        def oracle_fn(model, imgs):
            b, c, h, w = imgs.shape
            s = h // PATCH
            xm = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
            return xm.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

        rng = np.random.default_rng(51)
        imgs = rng.normal(size=(8, 3, INPUT, INPUT)).astype(np.float32)
        ids = (rng.integers(0, 4, (8, 1, INPUT, INPUT)) / 255.0).astype(
            np.float32
        )
        loader = [(imgs[i:i + 4], ids[i:i + 4]) for i in (0, 4)]
        fe = FeatureExtractorSimple(None, oracle_fn,
                                    eval_spatial_resolution=S, d_model=3)
        with caplog.at_level(logging.INFO,
                             logger="hbird_tpu.nn.search_approx"):
            ev = HbirdEvaluation(
                fe, loader, num_classes=21, n_neighbours=3,
                nn_method="ivf", dataset_size=8,
                nn_params=dict(num_leaves=4, recall_target=0.9,
                               query_block=64),
            )
        assert any("Calibrated num_leaves_to_search" in r.message
                   for r in caplog.records)
        assert 1 <= ev.NN_algorithm.num_leaves_to_search <= 4
        miou = float(ev.evaluate(loader, S, ignore_index=255))
        assert np.isfinite(miou)

    def test_explicit_probe_suppresses_calibration(self, caplog):
        import logging

        from hbird_tpu import HbirdEvaluation
        from hbird_tpu.models import FeatureExtractorSimple

        def oracle_fn(model, imgs):
            b, c, h, w = imgs.shape
            s = h // 4
            xm = imgs.reshape(b, c, s, 4, s, 4).mean(axis=(3, 5))
            return xm.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

        rng = np.random.default_rng(52)
        imgs = rng.normal(size=(4, 3, 32, 32)).astype(np.float32)
        ids = (rng.integers(0, 4, (4, 1, 32, 32)) / 255.0).astype(np.float32)
        fe = FeatureExtractorSimple(None, oracle_fn,
                                    eval_spatial_resolution=8, d_model=3)
        with caplog.at_level(logging.INFO,
                             logger="hbird_tpu.nn.search_approx"):
            ev = HbirdEvaluation(
                fe, [(imgs, ids)], num_classes=21, n_neighbours=3,
                nn_method="ivf", dataset_size=4,
                nn_params=dict(num_leaves=4, num_leaves_to_search=2,
                               recall_target=0.9, query_block=64),
            )
        assert not any("Calibrated num_leaves_to_search" in r.message
                       for r in caplog.records)
        assert ev.NN_algorithm.num_leaves_to_search == 2

    def test_engine_probe_mode_query_runs_eagerly(self):
        """probe_mode='query' must work through the ENGINE: per-query
        probing is host-orchestrated, so the eval step cannot be jitted —
        the backend flags jittable=False and the engine runs the step
        eagerly (caught by the CLI verify drive: the jitted step raised
        'needs concrete queries')."""
        from hbird_tpu import HbirdEvaluation
        from hbird_tpu.models import FeatureExtractorSimple

        INPUT, PATCH = 32, 4
        S = INPUT // PATCH

        def oracle_fn(model, imgs):
            b, c, h, w = imgs.shape
            s = h // PATCH
            xm = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
            return xm.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

        rng = np.random.default_rng(55)
        imgs = rng.normal(size=(8, 3, INPUT, INPUT)).astype(np.float32)
        ids = (rng.integers(0, 4, (8, 1, INPUT, INPUT)) / 255.0).astype(
            np.float32
        )
        loader = [(imgs[i:i + 4], ids[i:i + 4]) for i in (0, 4)]
        fe = FeatureExtractorSimple(None, oracle_fn,
                                    eval_spatial_resolution=S, d_model=3)

        def run(mode):
            ev = HbirdEvaluation(
                fe, loader, num_classes=21, n_neighbours=3,
                nn_method="ivf", dataset_size=8,
                nn_params=dict(num_leaves=4, num_leaves_to_search=4,
                               query_block=64, probe_mode=mode),
            )
            assert ev.NN_algorithm.jittable == (mode != "query")
            return float(ev.evaluate(loader, S, ignore_index=255))

        miou_query = run("query")
        miou_tile = run("tile")
        # Full probe (n_probe == num_leaves): both granularities scan
        # every leaf, so the scores — and the mIoU — must agree.
        assert np.isfinite(miou_query)
        np.testing.assert_allclose(miou_query, miou_tile, atol=1e-6)

    def test_recall_target_none_suppresses_calibration(self, caplog):
        # Explicit recall_target=None (e.g. YAML `recall_target: null`)
        # must DISABLE calibration, not trigger it with the auto-derived
        # target (key-presence vs is-not-None — round-3 review catch).
        import logging

        from hbird_tpu import HbirdEvaluation
        from hbird_tpu.models import FeatureExtractorSimple

        def oracle_fn(model, imgs):
            b, c, h, w = imgs.shape
            s = h // 4
            xm = imgs.reshape(b, c, s, 4, s, 4).mean(axis=(3, 5))
            return xm.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

        rng = np.random.default_rng(53)
        imgs = rng.normal(size=(4, 3, 32, 32)).astype(np.float32)
        ids = (rng.integers(0, 4, (4, 1, 32, 32)) / 255.0).astype(np.float32)
        fe = FeatureExtractorSimple(None, oracle_fn,
                                    eval_spatial_resolution=8, d_model=3)
        with caplog.at_level(logging.INFO,
                             logger="hbird_tpu.nn.search_approx"):
            ev = HbirdEvaluation(
                fe, [(imgs, ids)], num_classes=21, n_neighbours=3,
                nn_method="ivf", dataset_size=4,
                nn_params=dict(num_leaves=4, recall_target=None,
                               query_block=64),
            )
        assert not any("Calibrated num_leaves_to_search" in r.message
                       for r in caplog.records)

    def test_recall_target_skips_aot_compile(self, caplog):
        # When calibration will re-pick the probe count, the background
        # AOT compile is skipped entirely: its executable would be
        # discarded AND its in-flight remote compile would overlap
        # calibration's fresh compiles (never overlap fresh compiles).
        import logging

        from hbird_tpu import HbirdEvaluation
        from hbird_tpu.models import FeatureExtractorSimple

        INPUT, PATCH = 32, 4
        S = INPUT // PATCH

        def oracle_fn(model, imgs):
            b, c, h, w = imgs.shape
            s = h // PATCH
            xm = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
            return xm.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

        rng = np.random.default_rng(54)
        imgs = rng.normal(size=(8, 3, INPUT, INPUT)).astype(np.float32)
        ids = (rng.integers(0, 4, (8, 1, INPUT, INPUT)) / 255.0).astype(
            np.float32
        )
        loader = [(imgs[i:i + 4], ids[i:i + 4]) for i in (0, 4)]
        fe = FeatureExtractorSimple(None, oracle_fn,
                                    eval_spatial_resolution=S, d_model=3)
        with caplog.at_level(logging.INFO, logger="hbird_tpu.hbird_eval"):
            ev = HbirdEvaluation(
                fe, loader, num_classes=21, n_neighbours=3,
                nn_method="ivf", dataset_size=8,
                nn_params=dict(num_leaves=4, recall_target=0.9,
                               query_block=64),
                aot_eval=dict(batch_size=4, input_size=INPUT,
                              img_dtype=np.float32,
                              mask_dtype=np.float32),
            )
        assert any("Skipping the AOT eval compile" in r.message
                   for r in caplog.records)
        assert getattr(ev, "_aot", None) is None
        miou = float(ev.evaluate(loader, S, ignore_index=255))
        assert np.isfinite(miou)


class TestBankdirRecallTarget:
    def test_load_memory_bankdir_honors_recall_target(self, tmp_path, caplog):
        # The streamed .bankdir load builds the backend via from_bankdir,
        # bypassing _create_nn — recall_target must still calibrate there
        # (the CLI promises a MEASURED probe count; round-3 review catch).
        import logging

        from hbird_tpu.bank.io import save_memory_sharded
        from hbird_tpu.hbird_eval import HbirdEvaluation

        x, _ = mixture_bank(2000, 16, 4, seed=31)
        rng = np.random.default_rng(32)
        labels = rng.random((2000, 5)).astype(np.float32)
        f_p = str(tmp_path / "f.bankdir")
        l_p = str(tmp_path / "l.bankdir")
        save_memory_sharded(x, f_p, chunk_rows=512)
        save_memory_sharded(labels, l_p, chunk_rows=512)

        ev = HbirdEvaluation.__new__(HbirdEvaluation)
        ev.f_mem_p, ev.l_mem_p = f_p, l_p
        ev.n_neighbours = 5
        ev.nn_method = "ivf"
        ev.nn_params = {"num_leaves": 8, "recall_target": 0.9,
                        "query_block": 64, "use_int8": False}
        ev.num_classes = 5
        ev.memory_size = None
        ev.mesh = None
        ev.bf16_bank = False
        with caplog.at_level(logging.INFO,
                             logger="hbird_tpu.nn.search_approx"):
            assert ev.load_memory() is True
        assert any("Calibrated num_leaves_to_search" in r.message
                   for r in caplog.records)
        assert 1 <= ev.NN_algorithm.num_leaves_to_search <= 8


class TestPerQueryProbe:
    """probe_mode='query'/'auto' (round-4): per-query leaf probing for
    incoherent query sets — ScaNN's per-query leaves_to_search semantics
    (reference search_scann.py:26-27). Tile probing measured recall 0.538
    on 2048 iid queries at engine-equivalent budget (CLAUDE.md r3)."""

    def setup_method(self, _):
        # Many leaves, few queries: one 256-query tile spans ~48 primary
        # leaves — exactly the dilution regime.
        self.x, _ = mixture_bank(16384, 32, 48, seed=11, noise=0.05)
        self.n_leaves, self.cap = tree_layout(len(self.x), 48)
        (self.c, self.ivf_bank, _, self.perm,
         self.leaf_valid) = _build(self.x, self.n_leaves, self.cap)
        rng = np.random.default_rng(12)
        q = self.x[rng.integers(0, len(self.x), 256)] + 0.02 * rng.normal(
            size=(256, 32)
        )
        self.q = jnp.asarray(q.astype(np.float32))

    def _recall(self, idx):
        orig_idx = np.asarray(self.perm)[np.asarray(idx)]
        assert (orig_idx >= 0).all()
        k = orig_idx.shape[1]
        exact = np.asarray(self.q) @ self.x.T
        exact_idx = np.argsort(-exact, axis=1)[:, :k]
        return np.mean([
            len(set(orig_idx[i]) & set(exact_idx[i])) / k
            for i in range(len(orig_idx))
        ])

    def _search(self, mode, n_probe=8):
        return ivf_search(
            self.q, self.ivf_bank, self.c, self.leaf_valid, 10,
            cap=self.cap, n_probe=n_probe, block_q=256, kernel="xla",
            probe_mode=mode,
        )

    def test_sparse_recall_meets_target(self):
        _, idx_tile = self._search("tile")
        _, idx_query = self._search("query")
        r_tile, r_query = self._recall(idx_tile), self._recall(idx_query)
        # Matched scan budget (n_probe=8 of 48 leaves both ways): the
        # per-query path must fix the dilution (VERDICT r3 item 5).
        assert r_query >= 0.95, (r_query, r_tile)
        assert r_query > r_tile + 0.1, (r_query, r_tile)

    def test_no_duplicate_indices(self):
        # A row reachable via several probed leaves must fill one slot.
        _, idx = self._search("query")
        idx = np.asarray(idx)
        for row in idx:
            assert len(set(row.tolist())) == len(row)

    def test_values_match_exact_scores(self):
        vals, idx = self._search("query")
        orig = np.asarray(self.perm)[np.asarray(idx)]
        expect = np.take_along_axis(
            np.asarray(self.q) @ self.x.T, orig, axis=1
        )
        np.testing.assert_allclose(np.asarray(vals), expect, atol=1e-4)

    def test_auto_picks_query_for_sparse(self):
        from hbird_tpu.ops.ivf import tile_coherence

        assert tile_coherence(self.q, self.c, 256) > 8
        _, idx_auto = self._search("auto")
        _, idx_query = self._search("query")
        np.testing.assert_array_equal(
            np.asarray(idx_auto), np.asarray(idx_query)
        )

    def test_auto_keeps_tile_for_coherent(self):
        # Engine-density queries: many queries per leaf => coherent tiles.
        xq, _ = mixture_bank(2048, 32, 2, seed=13, noise=0.03)
        q = jnp.asarray(xq)
        from hbird_tpu.ops.ivf import tile_coherence

        assert tile_coherence(q, self.c, 256) <= 8
        v_auto, i_auto = ivf_search(
            q, self.ivf_bank, self.c, self.leaf_valid, 10,
            cap=self.cap, n_probe=16, block_q=256, kernel="xla",
            probe_mode="auto",
        )
        v_tile, i_tile = ivf_search(
            q, self.ivf_bank, self.c, self.leaf_valid, 10,
            cap=self.cap, n_probe=16, block_q=256, kernel="xla",
            probe_mode="tile",
        )
        np.testing.assert_array_equal(np.asarray(i_auto), np.asarray(i_tile))

    def test_auto_under_jit_traces_as_tile(self):
        import jax as _jax

        def f(q):
            return ivf_search(
                q, self.ivf_bank, self.c, self.leaf_valid, 10,
                cap=self.cap, n_probe=8, block_q=256, kernel="xla",
                probe_mode="auto",
            )

        v, i = _jax.jit(f)(self.q)
        v_t, i_t = self._search("tile")
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_t))

    def test_query_mode_refuses_tracers(self):
        import jax as _jax
        import pytest as _pytest

        def f(q):
            return ivf_search(
                q, self.ivf_bank, self.c, self.leaf_valid, 10,
                cap=self.cap, n_probe=8, kernel="xla", probe_mode="query",
            )

        with _pytest.raises(ValueError, match="concrete"):
            _jax.jit(f)(self.q)

    def test_backend_auto_probe_sparse_queries(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        nn = NearestNeighborSearchApprox(
            jnp.asarray(self.x), n_neighbors=10, use_tree=True,
            num_leaves=self.n_leaves, num_leaves_to_search=8,
            recall_target=None, tree_refine_rounds=0, use_fp16=False,
        )
        idx, _ = nn.find_nearest_neighbors(np.asarray(self.q))
        exact = np.asarray(self.q) @ self.x.T
        exact_idx = np.argsort(-exact, axis=1)[:, :10]
        recall = np.mean([
            len(set(idx[i]) & set(exact_idx[i])) / 10
            for i in range(len(idx))
        ])
        assert recall >= 0.9, recall


class TestDedupTopk:
    def test_duplicates_collapse(self):
        from hbird_tpu.ops.ivf import _dedup_topk

        vals = jnp.asarray([[5.0, 5.0, 3.0, 2.0, 3.0, 1.0]])
        idx = jnp.asarray([[7, 7, 4, 9, 4, 2]], dtype=jnp.int32)
        v, i = _dedup_topk(vals, idx, 3)
        assert sorted(np.asarray(i)[0].tolist()) == [4, 7, 9]
        np.testing.assert_allclose(np.sort(np.asarray(v)[0]), [2, 3, 5])

    def test_filler_does_not_mask_real_row_zero(self):
        """Underfilled-leaf fillers carry (val=-inf, idx=0); a REAL row-0
        candidate must survive dedup even when a filler sorts first."""
        from hbird_tpu.ops.ivf import NEG_INF, _dedup_topk

        vals = jnp.asarray([[NEG_INF, 9.0, 4.0, NEG_INF]])
        idx = jnp.asarray([[0, 0, 3, 0]], dtype=jnp.int32)
        v, i = _dedup_topk(vals, idx, 2)
        assert 0 in np.asarray(i)[0].tolist()
        assert 9.0 in np.asarray(v)[0].tolist()

    def test_underfilled_indices_stay_in_range(self):
        """Fewer than k distinct finite candidates: the trailing -inf
        slots must carry IN-RANGE indices (consumers map through the
        layout perm array; the internal 2**30 filler sentinel would be
        out of range)."""
        from hbird_tpu.ops.ivf import NEG_INF, _dedup_topk

        vals = jnp.asarray([[7.0, 7.0, NEG_INF, NEG_INF]])
        idx = jnp.asarray([[5, 5, 0, 0]], dtype=jnp.int32)
        v, i = _dedup_topk(vals, idx, 4)
        i = np.asarray(i)[0]
        v = np.asarray(v)[0]
        assert v[0] == 7.0 and i[0] == 5
        assert (i >= 0).all() and (i < 2**30).all(), i
        assert np.isneginf(v[1:]).all()


class TestPerQueryShapeBucketing:
    """The per-query path's kernel shapes must not vary with every query
    set (each distinct tile count is a fresh Pallas compile — minutes on
    the remote Mosaic compiler). Tile counts are bucketed to multiples
    of 16."""

    def test_tile_count_bucketed(self, monkeypatch):
        import hbird_tpu.ops.ivf as ivf_mod

        x, _ = mixture_bank(8192, 32, 48, seed=21, noise=0.05)
        n_leaves, cap = tree_layout(len(x), 48)
        c, ivf_bank, _, perm, leaf_valid = _build(x, n_leaves, cap)
        seen = []
        real = ivf_mod.ivf_search_xla

        def spy(q, bank, lids, lv, k, *, cap, **kw):
            seen.append((q.shape[0], lids.shape[0]))
            return real(q, bank, lids, lv, k, cap=cap, **kw)

        monkeypatch.setattr(ivf_mod, "ivf_search_xla", spy)
        rng = np.random.default_rng(0)
        for seed in range(3):
            q = jnp.asarray(
                rng.normal(size=(100 + 7 * seed, 32)).astype(np.float32)
            )
            vals, idx = ivf_mod.ivf_search_per_query(
                q, ivf_bank, c, leaf_valid, 5,
                cap=cap, n_probe=4, block_q=128, kernel="xla",
            )
            assert vals.shape == (q.shape[0], 5)
        assert seen, "spy never called"
        for q_rows, n_tiles in seen:
            assert n_tiles % 16 == 0, seen
            assert q_rows == n_tiles * 128, seen
