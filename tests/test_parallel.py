"""Mesh-sharded kNN tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hbird_tpu.ops import exact_knn
from hbird_tpu.parallel import make_mesh, sharded_knn_with_labels
from hbird_tpu.parallel.sharded_knn import pad_rows_for_mesh, shard_bank


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    m, d, c, q_n, k = 1000, 32, 7, 64, 5
    bank = rng.normal(size=(m, d)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    labels = rng.uniform(size=(m, c)).astype(np.float32)
    q = rng.normal(size=(q_n, d)).astype(np.float32)
    return q, bank, labels, k


class TestShardedKNN:
    def test_single_device_path(self, problem):
        q, bank, labels, k = problem
        vals, idx, lbls = sharded_knn_with_labels(
            jnp.asarray(q), jnp.asarray(bank), jnp.asarray(labels), k
        )
        ref_vals, ref_idx = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
        np.testing.assert_allclose(
            np.asarray(lbls), labels[np.asarray(idx)], atol=1e-6
        )

    @pytest.mark.parametrize("n_shards", [2, 8])
    def test_sharded_matches_single(self, problem, n_shards):
        q, bank, labels, k = problem
        mesh = make_mesh((n_shards,), ("bank",))
        bank_s, labels_s, valid = shard_bank(bank, labels, mesh)
        assert bank_s.shape[0] == pad_rows_for_mesh(bank.shape[0], n_shards)
        vals, idx, lbls = sharded_knn_with_labels(
            jnp.asarray(q), bank_s, labels_s, k, mesh=mesh, valid_rows=valid
        )
        ref_vals, ref_idx = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
        np.testing.assert_allclose(
            np.asarray(lbls), labels[np.asarray(ref_idx)], atol=1e-6
        )

    def test_2d_mesh_data_axis_replication(self, problem):
        q, bank, labels, k = problem
        mesh = make_mesh((2, 4), ("data", "bank"))
        bank_s, labels_s, valid = shard_bank(bank, labels, mesh)
        vals, idx, lbls = sharded_knn_with_labels(
            jnp.asarray(q), bank_s, labels_s, k, mesh=mesh, valid_rows=valid
        )
        _, ref_idx = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))

    def test_jit_wrapped(self, problem):
        # The sharded search must be traceable inside an outer jit (the
        # engine fuses forward + retrieval + metric in one program).
        q, bank, labels, k = problem
        mesh = make_mesh((4,), ("bank",))
        bank_s, labels_s, valid = shard_bank(bank, labels, mesh)

        @jax.jit
        def step(qq):
            vals, idx, lbls = sharded_knn_with_labels(
                qq, bank_s, labels_s, k, mesh=mesh, valid_rows=valid
            )
            return idx

        idx = step(jnp.asarray(q))
        _, ref_idx = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


class TestPallasShardedKNN:
    def test_pallas_kernel_sharded(self, problem):
        q, bank, labels, k = problem
        mesh = make_mesh((4,), ("bank",))
        bank_s, labels_s, valid = shard_bank(bank, labels, mesh)
        vals, idx, lbls = sharded_knn_with_labels(
            jnp.asarray(q), bank_s, labels_s, k, mesh=mesh, valid_rows=valid,
            kernel="pallas", query_block=64, bank_block=128,
        )
        ref_vals, ref_idx = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-5
        )
        same = np.asarray(idx) == np.asarray(ref_idx)
        tied = np.isclose(np.asarray(vals), np.asarray(ref_vals))
        assert np.all(same | tied)

    def test_pallas_kernel_single_device(self, problem):
        q, bank, labels, k = problem
        vals, idx, lbls = sharded_knn_with_labels(
            jnp.asarray(q), jnp.asarray(bank), jnp.asarray(labels), k,
            kernel="pallas", query_block=64, bank_block=128,
        )
        _, ref_idx = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
