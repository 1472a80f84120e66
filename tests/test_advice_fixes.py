"""Regression tests for the round-1 advisor findings (ADVICE.md)."""

import numpy as np
import pytest


class TestRerankInvalidCandidates:
    """ADVICE medium: banks smaller than num_reordering_candidates used to
    re-score NEG_INF filler candidates (clamped to row 0) and return
    duplicated/wrong neighbors."""

    def test_tiny_bank_default_reorder(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
        from hbird_tpu.ops.knn import exact_knn
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        m, d, k = 60, 16, 30
        bank = rng.normal(size=(m, d)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        q = rng.normal(size=(8, d)).astype(np.float32)
        # Default reorder(120) > 60 bank rows.
        nn = NearestNeighborSearchApprox(
            bank, n_neighbors=k, num_reordering_candidates=120,
        )
        idx, _ = nn.find_nearest_neighbors(q, k)
        _, ref = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        ref = np.asarray(ref)
        for i in range(q.shape[0]):
            assert len(set(idx[i].tolist())) == k, "duplicated neighbors"
            assert set(idx[i].tolist()) == set(ref[i].tolist())

    def test_tiny_bank_int8_rerank(self):
        from hbird_tpu.nn.search_exact import NearestNeighborSearchExact
        from hbird_tpu.ops.knn import exact_knn
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        m, d, k = 50, 16, 20
        bank = rng.normal(size=(m, d)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        q = rng.normal(size=(8, d)).astype(np.float32)
        nn8 = NearestNeighborSearchExact(
            bank, n_neighbors=k, use_int8=True, num_reordering_candidates=120,
        )
        idx, _ = nn8.find_nearest_neighbors(q, k)
        _, ref = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        ref = np.asarray(ref)
        for i in range(q.shape[0]):
            assert len(set(idx[i].tolist())) == k, "duplicated neighbors"
            recall = len(set(idx[i].tolist()) & set(ref[i].tolist())) / k
            assert recall >= 0.95, recall

    def test_sharded_rerank_shard_smaller_than_candidates(self):
        from hbird_tpu.parallel import make_mesh
        from hbird_tpu.parallel.sharded_knn import (
            shard_bank, sharded_knn_with_labels,
        )
        from hbird_tpu.ops.knn import exact_knn
        import jax.numpy as jnp

        rng = np.random.default_rng(2)
        m, d, c, k = 200, 16, 4, 10  # 4 shards x 50 rows < 120 candidates
        bank = rng.normal(size=(m, d)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        labels = rng.uniform(size=(m, c)).astype(np.float32)
        q = rng.normal(size=(16, d)).astype(np.float32)
        mesh = make_mesh((4,), ("bank",))
        bank_s, labels_s, valid = shard_bank(bank, labels, mesh)
        vals, idx, lbls = sharded_knn_with_labels(
            jnp.asarray(q), bank_s, labels_s, k, mesh=mesh,
            valid_rows=valid, kernel="xla",
            rerank_bank=bank_s, rerank_candidates=120,
        )
        _, ref = exact_knn(jnp.asarray(q), jnp.asarray(bank), k)
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), axis=-1), np.sort(np.asarray(ref), axis=-1)
        )


class TestConfMatIntegerAccumulation:
    """ADVICE low: f32 conf-mat accumulator rounded above 2^24 counts."""

    def test_single_update_past_2_24(self):
        from hbird_tpu.utils.eval_metrics import confusion_matrix

        n = (1 << 24) + 1  # 16,777,217 — not representable in f32
        gt = np.zeros(n, np.int32)
        pred = np.zeros(n, np.int32)
        conf = np.asarray(confusion_matrix(gt, pred, 2, 2, None))
        assert conf.dtype == np.int32
        assert conf[0, 0] == n


class TestBankIOPaths:
    """ADVICE low: extension-less save paths were never found by
    load_memory's isfile gate."""

    def test_extensionless_roundtrip(self, tmp_path):
        from hbird_tpu.bank.io import load_memory, memory_path_on_disk, save_memory

        mem = np.arange(12, dtype=np.float32).reshape(3, 4)
        p = str(tmp_path / "bank_no_ext")
        written = save_memory(mem, p)
        assert written.endswith(".npy")
        assert memory_path_on_disk(p) == written
        np.testing.assert_array_equal(load_memory(p), mem)

    def test_engine_reload_extensionless(self, tmp_path):
        from hbird_tpu.bank.io import save_memory
        from hbird_tpu.hbird_eval import HbirdEvaluation

        f_p = str(tmp_path / "fmem")
        l_p = str(tmp_path / "lmem")
        save_memory(np.ones((5, 4), np.float32), f_p)
        save_memory(np.ones((5, 2), np.float32), l_p)
        ev = HbirdEvaluation.__new__(HbirdEvaluation)
        ev.f_mem_p, ev.l_mem_p = f_p, l_p
        ev.n_neighbours, ev.nn_method, ev.nn_params = 2, "exact", {}
        ev.num_classes = 2
        ev.memory_size = None
        ev.mesh = None
        ev.bf16_bank = False
        assert ev.load_memory() is True
        assert ev.feature_memory.shape == (5, 4)


class TestConvertHeadsWarning:
    """ADVICE low: silent 64-dim-head assumption for ambiguous widths."""

    def test_warns_for_width_384(self):
        from hbird_tpu.models.convert import infer_config_from_timm_sd

        d, p, depth = 384, 16, 1
        sd = {
            "patch_embed.proj.weight": np.zeros((d, 3, p, p), np.float32),
            "pos_embed": np.zeros((1, 197, d), np.float32),
            "blocks.0.mlp.fc1.weight": np.zeros((4 * d, d), np.float32),
        }
        with pytest.warns(UserWarning, match="num_heads"):
            cfg = infer_config_from_timm_sd(sd)
        assert cfg.num_heads == 6

    def test_no_warning_for_width_768(self):
        import warnings

        from hbird_tpu.models.convert import infer_config_from_timm_sd

        d, p = 768, 14
        sd = {
            "patch_embed.proj.weight": np.zeros((d, 3, p, p), np.float32),
            "pos_embed": np.zeros((1, 257, d), np.float32),
            "blocks.0.mlp.fc1.weight": np.zeros((4 * d, d), np.float32),
        }
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            cfg = infer_config_from_timm_sd(sd)
        assert cfg.num_heads == 12
