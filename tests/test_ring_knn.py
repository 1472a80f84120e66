"""Ring (query-sharded) multi-chip search vs the single-device oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from hbird_tpu.ops.knn import exact_knn
from hbird_tpu.parallel import make_mesh
from hbird_tpu.parallel.sharded_knn import (
    ring_knn_with_labels,
    shard_bank,
    sharded_knn_with_labels,
)


def _fixture(m=512, d=24, c=6, q=96, seed=0):
    rng = np.random.default_rng(seed)
    bank = rng.normal(size=(m, d)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    labels = rng.uniform(size=(m, c)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    return bank, labels, queries


class TestRingMatchesOracle:
    def test_1d_mesh_exact_match(self):
        bank, labels, q = _fixture()
        k = 7
        mesh = make_mesh((8,), ("bank",))
        bank_s, labels_s, valid = shard_bank(bank, labels, mesh)
        vals, idx, lab = ring_knn_with_labels(
            jnp.asarray(q), bank_s, labels_s, k, mesh=mesh,
            valid_rows=valid, kernel="xla",
        )
        ref_vals, ref_idx = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-6
        )
        # Neighbor sets must match exactly (values have no near-ties here).
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), -1), np.sort(np.asarray(ref_idx), -1)
        )
        # Labels: each returned row's label equals the bank label of its id.
        np.testing.assert_allclose(
            np.asarray(lab),
            labels[np.asarray(idx)],
            rtol=1e-6, atol=1e-7,
        )

    def test_matches_allgather_merge(self):
        bank, labels, q = _fixture(m=300, q=40, seed=1)
        k = 5
        mesh = make_mesh((4,), ("bank",))
        bank_s, labels_s, valid = shard_bank(bank, labels, mesh)
        r_vals, r_idx, r_lab = ring_knn_with_labels(
            jnp.asarray(q), bank_s, labels_s, k, mesh=mesh,
            valid_rows=valid, kernel="xla",
        )
        g_vals, g_idx, g_lab = sharded_knn_with_labels(
            jnp.asarray(q), bank_s, labels_s, k, mesh=mesh,
            valid_rows=valid, kernel="xla",
        )
        np.testing.assert_allclose(
            np.asarray(r_vals), np.asarray(g_vals), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.sort(np.asarray(r_idx), -1), np.sort(np.asarray(g_idx), -1)
        )
        # Compare labels via sorted neighbor order (tie order may differ).
        np.testing.assert_allclose(
            np.asarray(r_lab)[np.arange(40)[:, None], np.argsort(np.asarray(r_idx), -1)],
            np.asarray(g_lab)[np.arange(40)[:, None], np.argsort(np.asarray(g_idx), -1)],
            rtol=1e-6, atol=1e-7,
        )

    def test_2d_mesh_query_partition(self):
        bank, labels, q = _fixture(m=256, q=64, seed=2)
        k = 4
        mesh = make_mesh((2, 4), ("data", "bank"))
        bank_s, labels_s, valid = shard_bank(bank, labels, mesh)
        vals, idx, lab = ring_knn_with_labels(
            jnp.asarray(q), bank_s, labels_s, k, mesh=mesh,
            valid_rows=valid, kernel="xla",
            query_partition=("data", "bank"),
        )
        ref_vals, ref_idx = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), -1), np.sort(np.asarray(ref_idx), -1)
        )

    def test_ragged_queries_and_partial_valid_rows(self):
        """Q not divisible by the partition and a bank whose last shard is
        mostly padding."""
        bank, labels, q = _fixture(m=130, q=37, seed=3)
        k = 3
        mesh = make_mesh((8,), ("bank",))
        bank_s, labels_s, valid = shard_bank(bank, labels, mesh)
        assert valid == 130 and bank_s.shape[0] % 8 == 0
        vals, idx, lab = ring_knn_with_labels(
            jnp.asarray(q), bank_s, labels_s, k, mesh=mesh,
            valid_rows=valid, kernel="xla",
        )
        ref_vals, ref_idx = exact_knn(
            jnp.asarray(q), jnp.asarray(bank), k
        )
        assert vals.shape == (37, k)
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-6
        )
        assert np.asarray(idx).max() < 130


class TestRingRerank:
    def test_ring_with_rerank_matches_oracle(self):
        """Ring + ScaNN-style exact reorder, incl. shards smaller than the
        candidate budget."""
        from hbird_tpu.ops.knn import exact_knn
        from hbird_tpu.parallel.sharded_knn import (
            ring_knn_with_labels, shard_bank,
        )
        from hbird_tpu.parallel import make_mesh

        bank, labels, q = _fixture(m=200, q=24, seed=4)
        k = 6
        mesh = make_mesh((4,), ("bank",))
        bank_s, labels_s, valid = shard_bank(bank, labels, mesh)
        vals, idx, lab = ring_knn_with_labels(
            jnp.asarray(q), bank_s, labels_s, k, mesh=mesh,
            valid_rows=valid, kernel="xla",
            rerank_bank=bank_s, rerank_candidates=120,
        )
        ref_vals, ref_idx = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), -1), np.sort(np.asarray(ref_idx), -1)
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(vals), -1), np.sort(np.asarray(ref_vals), -1),
            rtol=1e-5, atol=1e-6,
        )

    def test_ring_int8_rerank_backend(self):
        """The full backend path: int8 scan + bf16 rerank over the ring."""
        from hbird_tpu.nn.search_exact import NearestNeighborSearchExact
        from hbird_tpu.ops.knn import exact_knn
        from hbird_tpu.parallel import make_mesh

        rng = np.random.default_rng(5)
        m, d, k = 1000, 32, 8
        bank = rng.normal(size=(m, d)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        q = rng.normal(size=(32, d)).astype(np.float32)
        mesh = make_mesh((4,), ("bank",))
        nn8 = NearestNeighborSearchExact(
            bank, n_neighbors=k, use_int8=True, num_reordering_candidates=60,
            mesh=mesh, shard_strategy="ring", query_block=32, bank_block=128,
        )
        idx, _ = nn8.find_nearest_neighbors(q, k)
        _, ref = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        recall = np.mean(
            [len(set(idx[i]) & set(np.asarray(ref)[i])) / k for i in range(32)]
        )
        assert recall >= 0.95, recall
