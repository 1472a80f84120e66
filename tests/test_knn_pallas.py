"""Pallas fused kNN kernel vs brute force (interpret mode on CPU; the
same kernel compiles natively on TPU — benchmarked in bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hbird_tpu.ops.knn_pallas import pallas_knn


def _brute(q, bank, k):
    scores = q @ bank.T
    idx = np.argsort(-scores, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=-1), idx


class TestPallasKNN:
    @pytest.mark.parametrize(
        "q_n,m,d,k,block_q,block_m",
        [
            (16, 256, 32, 5, 8, 64),
            (30, 500, 16, 7, 16, 128),  # ragged everything
            (8, 128, 8, 8, 8, 128),
        ],
    )
    def test_matches_brute_force(self, q_n, m, d, k, block_q, block_m):
        rng = np.random.default_rng(q_n + m)
        q = rng.normal(size=(q_n, d)).astype(np.float32)
        bank = rng.normal(size=(m, d)).astype(np.float32)
        vals, idx = pallas_knn(
            jnp.asarray(q),
            jnp.asarray(bank),
            k,
            block_q=block_q,
            block_m=block_m,
            interpret=True,
        )
        ref_vals, ref_idx = _brute(q, bank, k)
        np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
        # Values decide; ties may order differently across tiles.
        same = np.asarray(idx) == ref_idx
        tied = np.isclose(np.asarray(vals), ref_vals)
        assert np.all(same | tied)

    def test_valid_rows_masking(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(8, 16)).astype(np.float32)
        bank = rng.normal(size=(200, 16)).astype(np.float32)
        padded = np.concatenate([bank, 50 * np.ones((56, 16), np.float32)])
        vals, idx = pallas_knn(
            jnp.asarray(q),
            jnp.asarray(padded),
            4,
            valid_rows=200,
            block_q=8,
            block_m=128,
            interpret=True,
        )
        assert int(np.asarray(idx).max()) < 200
        ref_vals, ref_idx = _brute(q, bank, 4)
        np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5)

    def test_unsorted_same_set(self):
        # k == k_pad (8): the raw unsorted buffer is exactly the top-k set.
        rng = np.random.default_rng(1)
        q = rng.normal(size=(8, 8)).astype(np.float32)
        bank = rng.normal(size=(256, 8)).astype(np.float32)
        _, idx_sorted = pallas_knn(
            jnp.asarray(q), jnp.asarray(bank), 8, block_q=8, block_m=128,
            interpret=True,
        )
        _, idx_uns = pallas_knn(
            jnp.asarray(q), jnp.asarray(bank), 8, block_q=8, block_m=128,
            sorted_results=False, interpret=True,
        )
        for r in range(8):
            assert set(np.asarray(idx_uns)[r]) == set(np.asarray(idx_sorted)[r])


class TestInt8Bank:
    def test_int8_backend_self_retrieval(self):
        from hbird_tpu.nn.search_exact import NearestNeighborSearchExact

        rng = np.random.default_rng(0)
        m, d, k = 2000, 64, 10
        bank = rng.normal(size=(m, d)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        labels = rng.uniform(size=(m, 5)).astype(np.float32)
        src = rng.integers(0, m, size=128)
        q = bank[src] * 2.0 + 0.005 * rng.normal(size=(128, d)).astype(np.float32)

        nn8 = NearestNeighborSearchExact(
            bank, n_neighbors=k, use_int8=True, label_memory=labels,
            query_block=64, bank_block=256,
        )
        assert nn8.bank.dtype == jnp.int8
        vals, idx, lbls = nn8.search_with_labels(jnp.asarray(q), k)
        top1 = np.asarray(idx)[:, 0]
        assert (top1 == src).mean() >= 0.95  # quantized self-retrieval

        # Scores rescaled to approximate dot products (cos in [0.9, 2.2]).
        v = np.asarray(vals)[:, 0]
        true = (q * bank[src]).sum(-1)
        np.testing.assert_allclose(v[top1 == src], true[top1 == src], rtol=0.1)

    def test_int8_recall_vs_exact(self):
        from hbird_tpu.nn.search_exact import NearestNeighborSearchExact
        from hbird_tpu.ops.knn import exact_knn

        rng = np.random.default_rng(1)
        m, d, k = 3000, 64, 10
        bank = rng.normal(size=(m, d)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        q = rng.normal(size=(64, d)).astype(np.float32)
        nn8 = NearestNeighborSearchExact(
            bank, n_neighbors=k, use_int8=True, query_block=64, bank_block=512,
        )
        idx8, _ = nn8.find_nearest_neighbors(q, k)
        _, ref = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        recall = np.mean(
            [len(set(idx8[i]) & set(np.asarray(ref)[i])) / k for i in range(64)]
        )
        assert recall >= 0.7, recall

    def test_int8_with_exact_rerank_recall_1(self):
        """reorder(C) semantics: int8 scan + exact bf16 rerank recovers the
        exact top-k (recall ~1.0)."""
        from hbird_tpu.nn.search_exact import NearestNeighborSearchExact
        from hbird_tpu.ops.knn import exact_knn

        rng = np.random.default_rng(2)
        m, d, k = 3000, 64, 10
        bank = rng.normal(size=(m, d)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        q = rng.normal(size=(64, d)).astype(np.float32)
        nn8 = NearestNeighborSearchExact(
            bank, n_neighbors=k, use_int8=True, num_reordering_candidates=60,
            query_block=64, bank_block=512,
        )
        assert nn8.rerank_bank is not None
        idx8, vals8 = nn8.find_nearest_neighbors(q, k)
        _, ref = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        recall = np.mean(
            [len(set(idx8[i]) & set(np.asarray(ref)[i])) / k for i in range(64)]
        )
        assert recall >= 0.97, recall

    def test_int8_rerank_sharded(self):
        from hbird_tpu.nn.search_exact import NearestNeighborSearchExact
        from hbird_tpu.ops.knn import exact_knn
        from hbird_tpu.parallel import make_mesh

        rng = np.random.default_rng(3)
        m, d, k = 2000, 32, 6
        bank = rng.normal(size=(m, d)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        q = rng.normal(size=(32, d)).astype(np.float32)
        mesh = make_mesh((4,), ("bank",))
        nn8 = NearestNeighborSearchExact(
            bank, n_neighbors=k, use_int8=True, num_reordering_candidates=40,
            mesh=mesh, query_block=32, bank_block=128,
        )
        idx8, _ = nn8.find_nearest_neighbors(q, k)
        _, ref = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        recall = np.mean(
            [len(set(idx8[i]) & set(np.asarray(ref)[i])) / k for i in range(32)]
        )
        assert recall >= 0.95, recall

    def test_approx_with_rerank(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
        from hbird_tpu.ops.knn import exact_knn

        rng = np.random.default_rng(4)
        m, d, k = 4096, 32, 8
        bank = rng.normal(size=(m, d)).astype(np.float32)
        q = rng.normal(size=(32, d)).astype(np.float32)
        nn_a = NearestNeighborSearchApprox(
            bank, n_neighbors=k, num_reordering_candidates=64,
            recall_target=0.9, bank_block=4096,
        )
        idx_a, _ = nn_a.find_nearest_neighbors(q, k)
        _, ref = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        recall = np.mean(
            [len(set(idx_a[i]) & set(np.asarray(ref)[i])) / k for i in range(32)]
        )
        assert recall >= 0.85, recall


@pytest.mark.slow  # rejected merge variant kept for coverage; ~15s in interpret mode
class TestBucketMerge:
    """Tournament (group-max) merge variant vs the oracle (interpret mode)."""

    def test_matches_exact_random(self):
        from hbird_tpu.ops.knn import exact_knn
        from hbird_tpu.ops.knn_pallas import pallas_knn

        rng = np.random.default_rng(10)
        bank = rng.normal(size=(4096, 32)).astype(np.float32)
        q = rng.normal(size=(64, 32)).astype(np.float32)
        vals, idx = pallas_knn(
            jnp.asarray(q), jnp.asarray(bank), 30, block_q=64,
            block_m=1024, merge_mode="bucket", n_buckets=32,
        )
        rv, ri = exact_knn(jnp.asarray(q), jnp.asarray(bank), 30)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), rtol=1e-5)
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), -1), np.sort(np.asarray(ri), -1)
        )

    def test_all_winners_in_one_bucket(self):
        """Adversarial: every top-k member shares a bucket -> k rounds."""
        from hbird_tpu.ops.knn import exact_knn
        from hbird_tpu.ops.knn_pallas import pallas_knn

        bank = np.zeros((2048, 8), np.float32)
        bank[:64, 0] = np.linspace(1, 2, 64)
        q = np.ones((8, 8), np.float32)
        vals, idx = pallas_knn(
            jnp.asarray(q), jnp.asarray(bank), 30, block_q=8,
            block_m=2048, merge_mode="bucket", n_buckets=16,
        )
        rv, _ = exact_knn(jnp.asarray(q), jnp.asarray(bank), 30)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(rv))

    def test_valid_rows_masking(self):
        from hbird_tpu.ops.knn import exact_knn
        from hbird_tpu.ops.knn_pallas import pallas_knn

        rng = np.random.default_rng(11)
        bank = rng.normal(size=(1024, 16)).astype(np.float32)
        q = rng.normal(size=(16, 16)).astype(np.float32)
        vals, idx = pallas_knn(
            jnp.asarray(q), jnp.asarray(bank), 10, block_q=16,
            block_m=512, merge_mode="bucket", n_buckets=8, valid_rows=700,
        )
        _, ri = exact_knn(jnp.asarray(q), jnp.asarray(bank[:700]), 10)
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), -1), np.sort(np.asarray(ri), -1)
        )


class TestCarryMerges:
    """carry (default) and carry2 variants vs the oracle (interpret)."""

    @pytest.mark.parametrize("mode", ["carry", "carry2", "carry_nw", "carry_lazy"])
    def test_matches_exact(self, mode):
        from hbird_tpu.ops.knn import exact_knn
        from hbird_tpu.ops.knn_pallas import pallas_knn

        rng = np.random.default_rng(20)
        bank = rng.normal(size=(3000, 24)).astype(np.float32)
        q = rng.normal(size=(48, 24)).astype(np.float32)
        vals, idx = pallas_knn(
            jnp.asarray(q), jnp.asarray(bank), 17, block_q=48,
            block_m=1024, merge_mode=mode,
        )
        rv, ri = exact_knn(jnp.asarray(q), jnp.asarray(bank), 17)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), rtol=1e-5)
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), -1), np.sort(np.asarray(ri), -1)
        )

    @pytest.mark.parametrize("mode", ["carry", "carry2", "carry_nw", "carry_lazy"])
    def test_ties_and_valid_rows(self, mode):
        from hbird_tpu.ops.knn import exact_knn
        from hbird_tpu.ops.knn_pallas import pallas_knn

        bank = np.zeros((512, 8), np.float32)
        bank[:40, 0] = 1.0
        q = np.ones((4, 8), np.float32)
        vals, _ = pallas_knn(
            jnp.asarray(q), jnp.asarray(bank), 30, block_q=8,
            block_m=256, merge_mode=mode, valid_rows=300,
        )
        rv, _ = exact_knn(jnp.asarray(q), jnp.asarray(bank[:300]), 30)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(rv))


class TestPallasL2:
    """Expanded-norm L2 in the fused kernel (Faiss GpuIndexFlatL2 parity,
    reference search_faiss.py:38-44)."""

    def _brute_l2(self, q, bank, k):
        # score convention: q·b − ||b||²/2 (ordering == ascending ||q−b||²)
        scores = q @ bank.T - 0.5 * (bank * bank).sum(-1)[None, :]
        idx = np.argsort(-scores, axis=-1, kind="stable")[:, :k]
        return np.take_along_axis(scores, idx, axis=-1), idx

    @pytest.mark.parametrize(
        "q_n,m,d,k,block_q,block_m",
        [
            (16, 256, 32, 5, 8, 64),
            (30, 500, 16, 7, 16, 128),  # ragged shapes + row padding
        ],
    )
    def test_matches_brute_force(self, q_n, m, d, k, block_q, block_m):
        rng = np.random.default_rng(1000 + q_n)
        # Unnormalized rows: the l2 ordering genuinely differs from dot.
        q = rng.normal(size=(q_n, d)).astype(np.float32) * 2
        bank = (rng.normal(size=(m, d)) * rng.uniform(0.2, 3.0, (m, 1))).astype(
            np.float32
        )
        vals, idx = pallas_knn(
            jnp.asarray(q), jnp.asarray(bank), k,
            block_q=block_q, block_m=block_m, distance="l2", interpret=True,
        )
        ref_vals, ref_idx = self._brute_l2(q, bank, k)
        np.testing.assert_allclose(
            np.asarray(vals), ref_vals, rtol=1e-4, atol=1e-4
        )
        same = np.asarray(idx) == ref_idx
        tied = np.isclose(np.asarray(vals), ref_vals)
        assert np.all(same | tied)
        # And it must differ from dot-product ordering for this data.
        _, idx_dot = pallas_knn(
            jnp.asarray(q), jnp.asarray(bank), k,
            block_q=block_q, block_m=block_m, interpret=True,
        )
        assert not np.array_equal(np.asarray(idx_dot), ref_idx)

    def test_matches_xla_l2_path(self):
        from hbird_tpu.ops.knn import exact_knn

        rng = np.random.default_rng(77)
        q = rng.normal(size=(24, 24)).astype(np.float32)
        bank = (rng.normal(size=(300, 24)) * 1.7).astype(np.float32)
        pv, pi = pallas_knn(
            jnp.asarray(q), jnp.asarray(bank), 9,
            block_q=8, block_m=128, distance="l2", interpret=True,
        )
        xv, xi = exact_knn(jnp.asarray(q), jnp.asarray(bank), 9, distance="l2")
        np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))

    def test_valid_rows_masked(self):
        rng = np.random.default_rng(5)
        q = rng.normal(size=(8, 16)).astype(np.float32)
        bank = rng.normal(size=(200, 16)).astype(np.float32)
        # Make the tail rows unbeatable under l2 (tiny norm near queries'
        # scale would win); they must still never appear.
        bank[120:] = q[0] * 1.0
        vals, idx = pallas_knn(
            jnp.asarray(q), jnp.asarray(bank), 6,
            valid_rows=120, block_q=8, block_m=64, distance="l2",
            interpret=True,
        )
        assert np.asarray(idx).max() < 120
        ref_vals, ref_idx = self._brute_l2(q, bank[:120], 6)
        np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4)

    def test_backend_routes_l2_to_pallas(self):
        from hbird_tpu.nn.search_exact import NearestNeighborSearchExact

        rng = np.random.default_rng(6)
        bank = (rng.normal(size=(400, 16)) * 1.5).astype(np.float32)
        nn = NearestNeighborSearchExact(
            jnp.asarray(bank), n_neighbors=5, distance_measure="l2"
        )
        assert nn.kernel == "pallas"
        q = rng.normal(size=(12, 16)).astype(np.float32)
        idx, vals = nn.find_nearest_neighbors(q)
        ref_vals, ref_idx = self._brute_l2(q, bank, 5)
        np.testing.assert_allclose(vals, ref_vals, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(idx, ref_idx)

    def test_sharded_l2_matches_single_device(self):
        from hbird_tpu.parallel.mesh import make_mesh
        from hbird_tpu.parallel.sharded_knn import (
            shard_bank,
            sharded_knn_with_labels,
        )

        rng = np.random.default_rng(8)
        bank = (rng.normal(size=(512, 16)) * 1.3).astype(np.float32)
        labels = rng.uniform(size=(512, 4)).astype(np.float32)
        q = rng.normal(size=(16, 16)).astype(np.float32)
        mesh = make_mesh((4,), ("bank",))
        bank_s, labels_s, valid = shard_bank(bank, labels, mesh)
        vals, idx, labs = sharded_knn_with_labels(
            jnp.asarray(q), bank_s, labels_s, 7,
            mesh=mesh, valid_rows=valid, distance="l2", kernel="pallas",
        )
        ref_vals, ref_idx = self._brute_l2(q, bank, 7)
        np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(
            np.asarray(labs), labels[ref_idx], atol=1e-5
        )

    def test_flat_scann_l2_routes_to_exact_kernel(self):
        """The flat 'scann' backend's non-dot path (r3 weak item): l2 now
        rides the fused exact kernel (recall 1.0) instead of the slow
        lax.approx_max_k scan."""
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        rng = np.random.default_rng(15)
        bank = (rng.normal(size=(600, 16)) * 1.4).astype(np.float32)
        nn = NearestNeighborSearchApprox(
            jnp.asarray(bank), n_neighbors=6, distance_measure="l2",
            use_fp16=False,
        )
        q = rng.normal(size=(20, 16)).astype(np.float32)
        idx, vals = nn.find_nearest_neighbors(q)
        ref_vals, ref_idx = self._brute_l2(q, bank, 6)
        np.testing.assert_allclose(vals, ref_vals, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(idx, ref_idx)
