"""Tests for the blockwise exact/approx kNN against brute force."""

import jax.numpy as jnp
import numpy as np

from hbird_tpu.ops import approx_knn, exact_knn, knn_search


def _brute_force(q, bank, k, distance="dot_product"):
    if distance == "dot_product":
        scores = q @ bank.T
    else:
        scores = q @ bank.T - 0.5 * (bank * bank).sum(-1)[None, :]
    idx = np.argsort(-scores, axis=-1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, idx, axis=-1)
    return vals, idx


class TestExactKNN:
    def test_matches_brute_force_dot(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(37, 16)).astype(np.float32)
        bank = rng.normal(size=(523, 16)).astype(np.float32)
        vals, idx = exact_knn(jnp.asarray(q), jnp.asarray(bank), 7, bank_block=128)
        ref_vals, ref_idx = _brute_force(q, bank, 7)
        np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)

    def test_matches_brute_force_l2(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=(11, 8)).astype(np.float32)
        bank = rng.normal(size=(301, 8)).astype(np.float32)
        vals, idx = exact_knn(
            jnp.asarray(q), jnp.asarray(bank), 5, distance="l2", bank_block=64
        )
        # l2 ordering must equal true euclidean ordering.
        d2 = ((q[:, None, :] - bank[None, :, :]) ** 2).sum(-1)
        ref_idx = np.argsort(d2, axis=-1, kind="stable")[:, :5]
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)

    def test_valid_rows_masks_padding(self):
        rng = np.random.default_rng(2)
        q = rng.normal(size=(4, 8)).astype(np.float32)
        bank = rng.normal(size=(100, 8)).astype(np.float32)
        padded = np.concatenate([bank, 100.0 * np.ones((28, 8), np.float32)])
        vals, idx = exact_knn(
            jnp.asarray(q), jnp.asarray(padded), 3, valid_rows=100, bank_block=32
        )
        assert int(np.asarray(idx).max()) < 100
        ref_vals, ref_idx = _brute_force(q, bank, 3)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)

    def test_query_blocking_irrelevant(self):
        rng = np.random.default_rng(3)
        q = rng.normal(size=(130, 8)).astype(np.float32)
        bank = rng.normal(size=(256, 8)).astype(np.float32)
        v1, i1 = exact_knn(jnp.asarray(q), jnp.asarray(bank), 4, query_block=32)
        v2, i2 = exact_knn(jnp.asarray(q), jnp.asarray(bank), 4, query_block=512)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestApproxKNN:
    def test_high_recall(self):
        rng = np.random.default_rng(4)
        q = rng.normal(size=(64, 32)).astype(np.float32)
        bank = rng.normal(size=(4096, 32)).astype(np.float32)
        k = 10
        _, idx = approx_knn(
            jnp.asarray(q), jnp.asarray(bank), k, recall_target=0.95, bank_block=4096
        )
        _, ref_idx = _brute_force(q, bank, k)
        recall = np.mean(
            [
                len(set(np.asarray(idx)[i]) & set(ref_idx[i])) / k
                for i in range(len(q))
            ]
        )
        assert recall >= 0.8


class TestDispatch:
    def test_method_aliases(self):
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        bank = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
        for m in ("exact", "faiss", "flat"):
            knn_search(m, q, bank, 3)
        for m in ("approx", "scann"):
            knn_search(m, q, bank, 3)


class TestTieOrdering:
    """Tie semantics, pinned (roadmap: characterize vs Faiss).

    Faiss GpuIndexFlat returns ties in ascending id order; our kernels
    document lowest-column-wins per tile. With k=30 and softmax label
    aggregation the effect on mIoU is nil (equal scores => equal
    weights), but the ordering must at least be deterministic.
    """

    def test_duplicate_rows_lowest_index_wins(self):
        import jax.numpy as jnp

        from hbird_tpu.ops.knn import exact_knn
        from hbird_tpu.ops.knn_pallas import pallas_knn

        rng = np.random.default_rng(0)
        base = rng.normal(size=(8, 16)).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        # bank = 4 copies of the same 8 rows -> every score 4-way tied
        bank = np.tile(base, (4, 1))
        q = base[:3]
        for fn in (
            lambda: exact_knn(jnp.asarray(q), jnp.asarray(bank), 4),
            lambda: pallas_knn(jnp.asarray(q), jnp.asarray(bank), 4),
        ):
            vals, idx = fn()
            idx = np.asarray(idx)
            # top-1 must be the query's own (lowest-id) copy, and repeated
            # runs must agree exactly (determinism)
            v2, i2 = fn()
            np.testing.assert_array_equal(idx, np.asarray(i2))
            assert (idx[np.arange(3), 0] % 8 == np.arange(3)).all()
            # all four returned neighbours are copies of the same row
            assert (idx % 8 == idx[:, :1] % 8).all()
