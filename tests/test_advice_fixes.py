"""Regression tests for the round-1 and round-2 advisor findings
(ADVICE.md)."""

import logging

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


def _clustered_bank(m, d, n_clusters, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 3
    asg = rng.integers(0, n_clusters, m)
    x = centers[asg] + rng.normal(size=(m, d)).astype(np.float32) * 0.3
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


class TestShardProbeSemantics:
    """ADVICE (r2) low: the leaf-sharded tree probes per-shard top-
    ceil(n_probe/p) leaves; shard_probe='full' must probe a per-shard
    SUPERSET so recall can only improve."""

    def test_full_probe_recall_at_least_split(self):
        import jax.numpy as jnp

        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
        from hbird_tpu.parallel import make_mesh

        x = _clustered_bank(3000, 32, 12, seed=5)
        rng = np.random.default_rng(6)
        q = jnp.asarray(
            x[rng.integers(0, 3000, 200)]
            + 0.02 * rng.normal(size=(200, 32)).astype(np.float32)
        )
        labels = jnp.asarray(rng.random((3000, 4)).astype(np.float32))
        mesh = make_mesh((4,), ("bank",))
        kw = dict(n_neighbors=10, use_tree=True, num_leaves=12,
                  num_leaves_to_search=6, query_block=64, mesh=mesh,
                  label_memory=labels)
        nn_split = NearestNeighborSearchApprox(x, shard_probe="split", **kw)
        nn_full = NearestNeighborSearchApprox(x, shard_probe="full", **kw)
        exact_idx = np.argsort(-(np.asarray(q) @ x.T), axis=1)[:, :10]

        def recall(nn):
            _, idx, _ = nn.search_with_labels(q, 10)
            idx = np.asarray(idx)
            return np.mean([
                len(set(idx[i]) & set(exact_idx[i])) / 10
                for i in range(len(idx))
            ])

        r_split, r_full = recall(nn_split), recall(nn_full)
        # 'full' probes a per-shard superset of 'split''s leaves.
        assert r_full >= r_split, (r_full, r_split)
        assert r_full > 0.75, r_full

    def test_invalid_shard_probe_raises(self):
        import jax.numpy as jnp

        from hbird_tpu.parallel import make_mesh
        from hbird_tpu.parallel.sharded_ivf import sharded_ivf_knn_with_labels

        mesh = make_mesh((4,), ("bank",))
        with pytest.raises(ValueError, match="shard_probe"):
            sharded_ivf_knn_with_labels(
                jnp.zeros((8, 8)), jnp.zeros((32, 8)), jnp.zeros((32, 2)),
                jnp.zeros((4, 8)), jnp.ones(4, jnp.int32), 2,
                mesh=mesh, cap=8, n_probe=2, shard_probe="bogus",
            )


class TestFlatScannParamBypass:
    """ADVICE (r2) low: flat 'scann' + dot_product routes to the exact
    kernel; explicitly-passed reorder/recall params must be signalled,
    not silently inert."""

    def test_logs_once_when_reorder_set(self, caplog):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        bank = _clustered_bank(100, 16, 3)
        with caplog.at_level(logging.INFO, logger="hbird_tpu.nn.search_approx"):
            NearestNeighborSearchApprox(
                bank, n_neighbors=5, num_reordering_candidates=120,
            )
        assert any("bypassed" in r.message for r in caplog.records)

    def test_silent_when_defaults(self, caplog):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        bank = _clustered_bank(100, 16, 3)
        with caplog.at_level(logging.INFO, logger="hbird_tpu.nn.search_approx"):
            NearestNeighborSearchApprox(bank, n_neighbors=5)
        assert not any("bypassed" in r.message for r in caplog.records)


class TestTreeReorderClamp:
    """ADVICE (r2) low: tree path with num_reordering_candidates > 128
    used to trip a bare kernel assert on TPU; it must clamp with a
    warning and still search correctly."""

    def test_reorder_250_clamps_and_runs(self, caplog):
        import jax.numpy as jnp

        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        x = _clustered_bank(2000, 32, 8, seed=9)
        rng = np.random.default_rng(10)
        q = jnp.asarray(x[rng.integers(0, 2000, 100)])
        nn = NearestNeighborSearchApprox(
            x, n_neighbors=10, use_tree=True, num_leaves=8,
            num_leaves_to_search=4, query_block=64,
            num_reordering_candidates=250,
            label_memory=jnp.asarray(rng.random((2000, 4)).astype(np.float32)),
        )
        with caplog.at_level(logging.WARNING,
                             logger="hbird_tpu.nn.search_approx"):
            _, idx, _ = nn.search_with_labels(q, 10)
        assert any("clamping to 128" in r.message for r in caplog.records)
        idx = np.asarray(idx)
        assert (idx >= 0).all() and (idx < 2000).all()
        exact_idx = np.argsort(-(np.asarray(q) @ x.T), axis=1)[:, :10]
        recall = np.mean([
            len(set(idx[i]) & set(exact_idx[i])) / 10 for i in range(len(idx))
        ])
        # Half the leaves probed on a tiny random tree — the point is the
        # clamp not crashing, not tree quality (covered by test_ivf).
        assert recall > 0.5, recall


class TestUnboundedOverflowSpill:
    """ADVICE (r2) low: unbounded builds with a stale/short dataset_size
    used to DROP rows past the preallocation; they must spill to host
    accumulation and match the chunked path exactly."""

    def _oracle(self, model, imgs):
        b, c, h, w = imgs.shape
        s = h // 4
        x = imgs.reshape(b, c, s, 4, s, 4).mean(axis=(3, 5))
        return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

    def _loader(self, n, seed=0):
        rng = np.random.default_rng(seed)
        imgs = rng.normal(size=(n, 3, 32, 32)).astype(np.float32)
        ids = (rng.integers(0, 5, (n, 1, 32, 32)) / 255.0).astype(np.float32)
        return [(imgs[i:i + 2], ids[i:i + 2]) for i in range(0, n, 2)]

    def test_overflow_matches_chunked(self):
        from hbird_tpu.hbird_eval import HbirdEvaluation
        from hbird_tpu.models import FeatureExtractorSimple

        fe = FeatureExtractorSimple(None, self._oracle,
                                    eval_spatial_resolution=8, d_model=3)
        loader = self._loader(6)
        # dataset_size=2 promises 128 rows; the loader yields 384.
        ev = HbirdEvaluation(
            fe, loader, num_classes=21, n_neighbours=3, dataset_size=2,
        )
        ev_chunked = HbirdEvaluation(fe, loader, num_classes=21, n_neighbours=3)
        assert ev.feature_memory.shape == ev_chunked.feature_memory.shape
        np.testing.assert_array_equal(
            np.asarray(ev.feature_memory), np.asarray(ev_chunked.feature_memory)
        )
        np.testing.assert_array_equal(
            np.asarray(ev.label_memory), np.asarray(ev_chunked.label_memory)
        )

    def test_overflow_mid_batch(self):
        from hbird_tpu.hbird_eval import HbirdEvaluation
        from hbird_tpu.models import FeatureExtractorSimple

        fe = FeatureExtractorSimple(None, self._oracle,
                                    eval_spatial_resolution=8, d_model=3)
        loader = self._loader(4, seed=1)
        # dataset_size=3 -> 192 rows; overflow starts mid-second-batch.
        ev = HbirdEvaluation(
            fe, loader, num_classes=21, n_neighbours=3, dataset_size=3,
        )
        ev_chunked = HbirdEvaluation(fe, loader, num_classes=21, n_neighbours=3)
        np.testing.assert_array_equal(
            np.asarray(ev.feature_memory), np.asarray(ev_chunked.feature_memory)
        )


class TestFlashBlockDivisors:
    """ADVICE r4 medium: tuned flash BlockSizes must divide the padded
    kv_seq_len — n_pad=2048 used to pick kb=1536 and raise ValueError."""

    @pytest.mark.parametrize("n", [1369, 1537, 2048, 2500, 4096])
    def test_eval_shape_accepts_any_length(self, n):
        import jax
        import jax.numpy as jnp
        from hbird_tpu.models.vit import _flash_attention

        b, h, hd = 1, 2, 64
        q = jax.ShapeDtypeStruct((b, h, n, hd), jnp.float32)
        # eval_shape traces the pallas call (BlockSizes validation runs)
        # without executing it, so this works on CPU hosts too.
        out = jax.eval_shape(
            lambda q, k, v: _flash_attention(q, k, v, hd**-0.5), q, q, q
        )
        assert out.shape == (b, h, n, hd)


class TestPerQueryEmptyQueries:
    """ADVICE r4 low: an empty query set used to pad 16 dummy tiles whose
    rows gather from a zero-row queries array."""

    def test_empty_queries_clean_shapes(self):
        import jax
        import jax.numpy as jnp
        from hbird_tpu.ops.ivf import (
            assign_leaves,
            balanced_layout,
            build_ivf_arrays,
            ivf_search,
            train_centroids,
        )

        rng = np.random.default_rng(0)
        bank = rng.normal(size=(512, 16)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        x = jnp.asarray(bank)
        c = train_centroids(x, 8, iters=5, key=jax.random.PRNGKey(0))
        choices = assign_leaves(x, c, n_choices=3)
        slots, fill = balanced_layout(choices, 8, 256)
        ivf_bank, _, _ = build_ivf_arrays(x, None, slots, 8, 256)
        q = jnp.zeros((0, 16), jnp.float32)
        vals, idx = ivf_search(
            q, ivf_bank, c, jnp.asarray(fill, jnp.int32), 5,
            cap=256, n_probe=4, probe_mode="query",
        )
        assert vals.shape == (0, 5) and idx.shape == (0, 5)
