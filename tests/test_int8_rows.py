"""Per-row-scale int8 (SQ8) bank — quantization='int8_rows'.

The per-row scheme (each bank row carries its own dequant scale,
multiplied onto the int32 scores in the kernel epilogue) is the honest
core of ScaNN's anisotropic-hashing quantized scoring (reference
hbird/nn/search_scann.py:29-30): ordering reflects DEQUANTIZED dot
products, so rows with a small dynamic range keep their resolution
instead of losing it to the bank-wide max.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hbird_tpu.nn.search_exact import NearestNeighborSearchExact
from hbird_tpu.ops.knn_pallas import pallas_knn


def _mixed_range_bank(rng, m, d):
    """Rows spanning 2 decades of dynamic range: the regime where a
    global int8 scale visibly loses resolution."""
    bank = rng.normal(size=(m, d)).astype(np.float32)
    bank *= 10.0 ** rng.uniform(-2, 0, size=(m, 1)).astype(np.float32)
    return bank


def _recall(idx, ref_idx):
    k = idx.shape[1]
    return np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / k for i in range(idx.shape[0])
    ])


class TestKernelRowScale:
    def test_row_scale_orders_dequantized_dots(self):
        rng = np.random.default_rng(0)
        m, d, q_n, k = 2048, 32, 128, 8
        bank = _mixed_range_bank(rng, m, d)
        q = rng.normal(size=(q_n, d)).astype(np.float32)

        scale = np.maximum(np.abs(bank).max(axis=1, keepdims=True), 1e-12) / 127
        codes = np.clip(np.round(bank / scale), -127, 127).astype(np.int8)
        q_scale = np.abs(q).max() / 127
        q8 = np.clip(np.round(q / q_scale), -127, 127).astype(np.int8)

        vals, idx = pallas_knn(
            jnp.asarray(q8), jnp.asarray(codes), k,
            row_scale=jnp.asarray(scale), block_q=64, block_m=512,
        )
        # Host oracle over the same dequantized scores.
        s_ref = (q8.astype(np.int32) @ codes.astype(np.int32).T).astype(
            np.float32
        ) * scale[:, 0][None, :]
        ref_idx = np.argsort(-s_ref, axis=1, kind="stable")[:, :k]
        ref_vals = np.take_along_axis(s_ref, ref_idx, axis=1)
        np.testing.assert_allclose(
            np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-6
        )
        # Values allow tied-score index swaps; the score sets must match.
        np.testing.assert_allclose(
            np.sort(np.asarray(vals), 1), np.sort(ref_vals, 1), rtol=1e-5
        )

    def test_row_scale_validation(self):
        rng = np.random.default_rng(1)
        bank = rng.normal(size=(256, 16)).astype(np.float32)
        q = rng.normal(size=(32, 16)).astype(np.float32)
        with pytest.raises(AssertionError):
            pallas_knn(
                jnp.asarray(q), jnp.asarray(bank), 4,
                row_scale=jnp.ones((256, 1), jnp.float32),
            )


class TestBackendInt8Rows:
    def test_row_scales_beat_global_on_mixed_range(self):
        # Adversarial-but-realistic geometry: a handful of huge-magnitude
        # decoy rows in one subspace set the GLOBAL scale 100x too coarse
        # for the ordinary rows the queries actually retrieve (those
        # collapse to ±1 codes); per-row scales keep their 7 bits.
        rng = np.random.default_rng(2)
        m, d, q_n, k = 8192, 64, 512, 10
        half = d // 2
        bank = np.zeros((m, d), np.float32)
        bank[:64, :half] = 100.0 * rng.normal(size=(64, half))
        small = rng.normal(size=(m - 64, half)).astype(np.float32)
        small /= np.linalg.norm(small, axis=1, keepdims=True)
        bank[64:, half:] = small
        q = np.zeros((q_n, d), np.float32)
        qs = rng.normal(size=(q_n, half)).astype(np.float32)
        q[:, half:] = qs / np.linalg.norm(qs, axis=1, keepdims=True)

        exact = NearestNeighborSearchExact(
            bank, n_neighbors=k, query_block=64, bank_block=512
        )
        glob = NearestNeighborSearchExact(
            bank, n_neighbors=k, use_int8=True,
            query_block=64, bank_block=512,
        )
        rows = NearestNeighborSearchExact(
            bank, n_neighbors=k, quantization="int8_rows",
            query_block=64, bank_block=512,
        )
        idx_e, vals_e = exact.find_nearest_neighbors(q, k)
        idx_g, _ = glob.find_nearest_neighbors(q, k)
        idx_r, vals_r = rows.find_nearest_neighbors(q, k)
        r_glob, r_rows = _recall(idx_g, idx_e), _recall(idx_r, idx_e)
        assert r_rows > 0.95, (r_rows, r_glob)
        assert r_rows > r_glob + 0.05, (r_rows, r_glob)
        # Values are approximate true dot products (q_scale * s_i units).
        assert np.abs(vals_r - vals_e).max() < 0.05

    def test_quantization_int8_aliases_global(self):
        rng = np.random.default_rng(3)
        bank = rng.normal(size=(1024, 32)).astype(np.float32)
        q = rng.normal(size=(64, 32)).astype(np.float32)
        a = NearestNeighborSearchExact(
            bank, n_neighbors=5, use_int8=True,
            query_block=64, bank_block=512,
        )
        b = NearestNeighborSearchExact(
            bank, n_neighbors=5, quantization="int8",
            query_block=64, bank_block=512,
        )
        ia, va = a.find_nearest_neighbors(q, 5)
        ib, vb = b.find_nearest_neighbors(q, 5)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_allclose(va, vb, rtol=1e-6)

    def test_invalid_quantization_rejected(self):
        with pytest.raises(ValueError):
            NearestNeighborSearchExact(
                np.zeros((8, 4), np.float32), quantization="int4"
            )

    def test_state_spec_scales_row_scale_with_rows(self):
        rng = np.random.default_rng(4)
        bank = rng.normal(size=(512, 16)).astype(np.float32)
        nn = NearestNeighborSearchExact(
            bank, n_neighbors=5, quantization="int8_rows",
            query_block=64, bank_block=512,
        )
        spec = nn.state_spec(4096)
        assert spec["bank_row_scale"].shape == (4096, 1)
        assert "bank_scale" not in spec

    def test_gather_features_dequantizes_per_row(self):
        rng = np.random.default_rng(5)
        bank = _mixed_range_bank(rng, 512, 16)
        nn = NearestNeighborSearchExact(
            bank, n_neighbors=5, quantization="int8_rows",
            query_block=64, bank_block=512,
        )
        idx = jnp.asarray(rng.integers(0, 512, size=(8, 5)))
        rows = np.asarray(nn.gather_features_pure(nn.device_state, idx))
        ref = bank[np.asarray(idx)]
        rel = np.abs(rows - ref).max() / np.abs(ref).max()
        assert rel < 0.01, rel


class TestInt8RowsSharded:
    def test_meshed_matches_single_device(self):
        rng = np.random.default_rng(6)
        m, d, q_n, k = 4096, 32, 256, 8
        bank = _mixed_range_bank(rng, m, d)
        labels = rng.uniform(size=(m, 4)).astype(np.float32)
        q = rng.normal(size=(q_n, d)).astype(np.float32)

        single = NearestNeighborSearchExact(
            bank, n_neighbors=k, quantization="int8_rows",
            label_memory=labels, query_block=64, bank_block=512,
        )
        from hbird_tpu.parallel import make_mesh

        mesh = make_mesh((4,), ("bank",))
        meshed = NearestNeighborSearchExact(
            bank, n_neighbors=k, quantization="int8_rows",
            label_memory=labels, mesh=mesh,
            query_block=64, bank_block=512,
        )
        vs, is_, ls = single.search_with_labels(jnp.asarray(q), k)
        vm, im, lm = meshed.search_with_labels(jnp.asarray(q), k)
        np.testing.assert_allclose(
            np.asarray(vs), np.asarray(vm), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(
            np.sort(np.asarray(is_), 1), np.sort(np.asarray(im), 1)
        )

    def test_ring_matches_gather(self):
        rng = np.random.default_rng(7)
        m, d, q_n, k = 4096, 32, 256, 8
        bank = _mixed_range_bank(rng, m, d)
        labels = rng.uniform(size=(m, 4)).astype(np.float32)
        q = rng.normal(size=(q_n, d)).astype(np.float32)
        from hbird_tpu.parallel import make_mesh

        mesh = make_mesh((4,), ("bank",))
        gather = NearestNeighborSearchExact(
            bank, n_neighbors=k, quantization="int8_rows",
            label_memory=labels, mesh=mesh,
            query_block=64, bank_block=512,
        )
        ring = NearestNeighborSearchExact(
            bank, n_neighbors=k, quantization="int8_rows",
            label_memory=labels, mesh=mesh, shard_strategy="ring",
            query_block=64, bank_block=512,
        )
        vg, ig, _ = gather.search_with_labels(jnp.asarray(q), k)
        vr, ir, _ = ring.search_with_labels(jnp.asarray(q), k)
        np.testing.assert_allclose(
            np.asarray(vg), np.asarray(vr), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(
            np.sort(np.asarray(ig), 1), np.sort(np.asarray(ir), 1)
        )


class TestEngineInt8Rows:
    def test_cli_nn_param_flows(self, tmp_path):
        """quantization=int8_rows through the engine via nn_params."""
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.synthetic import make_voc_fixture
        from hbird_tpu.data.transforms import get_hbird_val_transforms
        from hbird_tpu.models import FeatureExtractorSimple
        from hbird_tpu import HbirdEvaluation

        root = str(tmp_path / "voc")
        make_voc_fixture(
            root, n_train=6, n_val=3, size=(48, 32), colorize=True,
            seed=0, class_pool=[1, 2, 3],
        )
        INPUT, PATCH = 32, 4
        s = INPUT // PATCH

        def fn(model, imgs):
            b, c, h, w = imgs.shape
            x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
            return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

        va = get_hbird_val_transforms(INPUT)
        ds, _ = get_dataset("voc", root, 3, 0, va, va, None, None)
        fe = FeatureExtractorSimple(
            None, fn, eval_spatial_resolution=s, d_model=3
        )
        ev = HbirdEvaluation(
            fe, ds.train_dataloader(), num_classes=21, n_neighbours=3,
            nn_method="exact",
            nn_params={"quantization": "int8_rows"}, seed=1,
        )
        assert ev.NN_algorithm.int8_rows
        assert ev.NN_algorithm.bank.dtype == jnp.int8
        miou = ev.evaluate(ds.val_dataloader(), s, ignore_index=255)
        assert np.isfinite(float(miou))

    def test_engine_ivf_int8_rows(self, tmp_path):
        """quantization=int8_rows through the IVF tree backend."""
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.synthetic import make_voc_fixture
        from hbird_tpu.data.transforms import get_hbird_val_transforms
        from hbird_tpu.models import FeatureExtractorSimple
        from hbird_tpu import HbirdEvaluation

        root = str(tmp_path / "voc")
        make_voc_fixture(
            root, n_train=6, n_val=3, size=(48, 32), colorize=True,
            seed=0, class_pool=[1, 2, 3],
        )
        INPUT, PATCH = 32, 4
        s = INPUT // PATCH

        def fn(model, imgs):
            b, c, h, w = imgs.shape
            x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
            return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

        va = get_hbird_val_transforms(INPUT)
        ds, _ = get_dataset("voc", root, 3, 0, va, va, None, None)
        fe = FeatureExtractorSimple(
            None, fn, eval_spatial_resolution=s, d_model=3
        )
        ev = HbirdEvaluation(
            fe, ds.train_dataloader(), num_classes=21, n_neighbours=3,
            nn_method="ivf",
            nn_params={"quantization": "int8_rows", "num_leaves": 4,
                       "num_leaves_to_search": 4},
            seed=1,
        )
        nn = ev.NN_algorithm
        assert nn.int8_rows and nn.use_int8 and nn.use_tree
        assert nn.bank.dtype == jnp.int8
        assert nn._bank_row_scale is not None
        miou = ev.evaluate(ds.val_dataloader(), s, ignore_index=255)
        assert np.isfinite(float(miou))


class TestTreeInt8Rows:
    def _tree_fixture(self, seed=8, m=4096, d=32):
        rng = np.random.default_rng(seed)
        half = d // 2
        bank = np.zeros((m, d), np.float32)
        bank[:32, :half] = 100.0 * rng.normal(size=(32, half))
        small = rng.normal(size=(m - 32, half)).astype(np.float32)
        small /= np.linalg.norm(small, axis=1, keepdims=True)
        bank[32:, half:] = small
        labels = rng.uniform(size=(m, 4)).astype(np.float32)
        q = np.zeros((256, d), np.float32)
        qs = rng.normal(size=(256, half)).astype(np.float32)
        q[:, half:] = qs / np.linalg.norm(qs, axis=1, keepdims=True)
        return bank, labels, q

    def test_tree_row_scales_beat_global(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        bank, labels, q = self._tree_fixture()
        k = 8
        common = dict(
            n_neighbors=k, label_memory=labels, use_tree=True,
            num_leaves=8, num_leaves_to_search=8, query_block=64,
        )
        exact = NearestNeighborSearchApprox(
            bank, use_fp16=False, **common
        )
        glob = NearestNeighborSearchApprox(
            bank, quantization="int8", **common
        )
        rows = NearestNeighborSearchApprox(
            bank, quantization="int8_rows", **common
        )
        assert rows._bank_row_scale is not None
        assert rows.bank.dtype == jnp.int8
        idx_e = exact.find_nearest_neighbors(q, k)[0]
        idx_g = glob.find_nearest_neighbors(q, k)[0]
        idx_r = rows.find_nearest_neighbors(q, k)[0]
        r_g, r_r = _recall(idx_g, idx_e), _recall(idx_r, idx_e)
        assert r_r > 0.95, (r_r, r_g)
        assert r_r > r_g + 0.05, (r_r, r_g)

    def test_tree_meshed_row_scales(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
        from hbird_tpu.parallel import make_mesh

        bank, labels, q = self._tree_fixture(seed=9)
        k = 8
        mesh = make_mesh((4,), ("bank",))
        common = dict(
            n_neighbors=k, label_memory=labels, use_tree=True,
            num_leaves=8, num_leaves_to_search=8, query_block=64,
        )
        single = NearestNeighborSearchApprox(
            bank, quantization="int8_rows", **common
        )
        meshed = NearestNeighborSearchApprox(
            bank, quantization="int8_rows", mesh=mesh,
            shard_probe="full", **common
        )
        vs, is_, _ = single.search_with_labels(jnp.asarray(q), k)
        vm, im, _ = meshed.search_with_labels(jnp.asarray(q), k)
        # Full probe budget + identical layout => same neighbour values.
        np.testing.assert_allclose(
            np.sort(np.asarray(vs), 1), np.sort(np.asarray(vm), 1),
            rtol=1e-5, atol=1e-6,
        )

    def test_tree_row_scale_persistence(self, tmp_path):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        bank, labels, q = self._tree_fixture(seed=10)
        k = 8
        nn = NearestNeighborSearchApprox(
            bank, n_neighbors=k, label_memory=labels, use_tree=True,
            quantization="int8_rows", num_leaves=8,
            num_leaves_to_search=8, query_block=64,
        )
        treedir = str(tmp_path / "t.treedir")
        nn.save_tree(treedir)
        nn2 = NearestNeighborSearchApprox.load_tree(
            treedir, n_neighbors=k, num_leaves_to_search=8, query_block=64
        )
        assert nn2._bank_row_scale is not None
        assert nn2.labels.shape[1] == labels.shape[1]
        v1, i1, l1 = nn.search_with_labels(jnp.asarray(q), k)
        v2, i2, l2 = nn2.search_with_labels(jnp.asarray(q), k)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-6
        )

    def test_flat_scann_int8_rows(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        bank, labels, q = self._tree_fixture(seed=11)
        k = 8
        exact = NearestNeighborSearchApprox(
            bank, n_neighbors=k, label_memory=labels, use_fp16=False,
            query_block=64, bank_block=512,
        )
        rows = NearestNeighborSearchApprox(
            bank, n_neighbors=k, label_memory=labels,
            quantization="int8_rows", query_block=64, bank_block=512,
        )
        assert rows.bank.dtype == jnp.int8
        idx_e = exact.find_nearest_neighbors(q, k)[0]
        idx_r = rows.find_nearest_neighbors(q, k)[0]
        assert _recall(idx_r, idx_e) > 0.95


class TestAsymmetricInt8:
    """quantization='int8_asym': int8_rows storage + bf16 queries (the
    defining property of ScaNN's score_ah, reference
    search_scann.py:29-30) — shortlist error comes from bank rounding
    alone, so raw recall beats both symmetric schemes at the same bank
    bytes."""

    def test_asym_beats_symmetric_recall(self):
        rng = np.random.default_rng(20)
        m, d, q_n, k = 8192, 64, 512, 10
        bank = _mixed_range_bank(rng, m, d)
        q = rng.normal(size=(q_n, d)).astype(np.float32)
        common = dict(n_neighbors=k, query_block=64, bank_block=512)
        exact = NearestNeighborSearchExact(bank, **common)
        sym = NearestNeighborSearchExact(
            bank, quantization="int8_rows", **common
        )
        asym = NearestNeighborSearchExact(
            bank, quantization="int8_asym", **common
        )
        assert asym.int8_asym and asym.int8_rows and asym.use_int8
        assert asym.bank.dtype == jnp.int8
        idx_e, vals_e = exact.find_nearest_neighbors(q, k)
        idx_s = sym.find_nearest_neighbors(q, k)[0]
        idx_a, vals_a = asym.find_nearest_neighbors(q, k)
        r_sym, r_asym = _recall(idx_s, idx_e), _recall(idx_a, idx_e)
        # The VERDICT r4 bar: raw recall >= 0.99 with no reorder pass.
        assert r_asym >= 0.99, (r_asym, r_sym)
        assert r_asym >= r_sym, (r_asym, r_sym)
        # Values are approximate TRUE dot products directly (bank
        # rounding + bf16 queries only — no query quantization).
        rel = np.abs(vals_a - vals_e).max() / np.abs(vals_e).max()
        assert rel < 0.02, rel

    def test_asym_decoy_bank_recall(self):
        # The geometry that collapses the global scheme entirely: per-row
        # scales + unquantized queries must stay essentially exact.
        rng = np.random.default_rng(21)
        m, d, q_n, k = 4096, 64, 256, 8
        half = d // 2
        bank = np.zeros((m, d), np.float32)
        bank[:64, :half] = 100.0 * rng.normal(size=(64, half))
        small = rng.normal(size=(m - 64, half)).astype(np.float32)
        small /= np.linalg.norm(small, axis=1, keepdims=True)
        bank[64:, half:] = small
        q = np.zeros((q_n, d), np.float32)
        qs = rng.normal(size=(q_n, half)).astype(np.float32)
        q[:, half:] = qs / np.linalg.norm(qs, axis=1, keepdims=True)
        common = dict(n_neighbors=k, query_block=64, bank_block=512)
        exact = NearestNeighborSearchExact(bank, **common)
        asym = NearestNeighborSearchExact(
            bank, quantization="int8_asym", **common
        )
        idx_e = exact.find_nearest_neighbors(q, k)[0]
        idx_a = asym.find_nearest_neighbors(q, k)[0]
        # Unit-norm rows in a 32-dim subspace are near-tie dense; ~1% of
        # k=8 slots flip on bank rounding alone (global scale: ~0.0).
        assert _recall(idx_a, idx_e) >= 0.98

    def test_asym_meshed_matches_single_device(self):
        rng = np.random.default_rng(22)
        m, d, q_n, k = 4096, 32, 256, 8
        bank = _mixed_range_bank(rng, m, d)
        labels = rng.uniform(size=(m, 4)).astype(np.float32)
        q = rng.normal(size=(q_n, d)).astype(np.float32)
        from hbird_tpu.parallel import make_mesh

        common = dict(
            n_neighbors=k, quantization="int8_asym", label_memory=labels,
            query_block=64, bank_block=512,
        )
        single = NearestNeighborSearchExact(bank, **common)
        mesh = make_mesh((4,), ("bank",))
        meshed = NearestNeighborSearchExact(bank, mesh=mesh, **common)
        vs, is_, _ = single.search_with_labels(jnp.asarray(q), k)
        vm, im, _ = meshed.search_with_labels(jnp.asarray(q), k)
        np.testing.assert_allclose(
            np.asarray(vs), np.asarray(vm), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(
            np.sort(np.asarray(is_), 1), np.sort(np.asarray(im), 1)
        )

    def test_asym_tree(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        rng = np.random.default_rng(23)
        bank = _mixed_range_bank(rng, 4096, 32)
        labels = rng.uniform(size=(4096, 4)).astype(np.float32)
        q = rng.normal(size=(256, 32)).astype(np.float32)
        k = 8
        common = dict(
            n_neighbors=k, label_memory=labels, use_tree=True,
            num_leaves=8, num_leaves_to_search=8, query_block=64,
        )
        exact = NearestNeighborSearchApprox(bank, use_fp16=False, **common)
        asym = NearestNeighborSearchApprox(
            bank, quantization="int8_asym", **common
        )
        assert asym.int8_asym and asym.bank.dtype == jnp.int8
        idx_e = exact.find_nearest_neighbors(q, k)[0]
        idx_a = asym.find_nearest_neighbors(q, k)[0]
        # Full probe budget: recall gap is pure quantization error.
        assert _recall(idx_a, idx_e) >= 0.99

    def test_asym_flat_approx(self):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        rng = np.random.default_rng(24)
        bank = _mixed_range_bank(rng, 2048, 32)
        q = rng.normal(size=(128, 32)).astype(np.float32)
        k = 8
        exact = NearestNeighborSearchApprox(
            bank, n_neighbors=k, use_fp16=False,
            query_block=64, bank_block=512,
        )
        asym = NearestNeighborSearchApprox(
            bank, n_neighbors=k, quantization="int8_asym",
            query_block=64, bank_block=512,
        )
        idx_e = exact.find_nearest_neighbors(q, k)[0]
        idx_a = asym.find_nearest_neighbors(q, k)[0]
        assert _recall(idx_a, idx_e) >= 0.99

    def test_asym_treedir_roundtrip(self, tmp_path):
        from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

        rng = np.random.default_rng(25)
        bank = _mixed_range_bank(rng, 2048, 32)
        labels = rng.uniform(size=(2048, 4)).astype(np.float32)
        q = rng.normal(size=(64, 32)).astype(np.float32)
        k = 8
        nn = NearestNeighborSearchApprox(
            bank, n_neighbors=k, label_memory=labels, use_tree=True,
            quantization="int8_asym", num_leaves=8,
            num_leaves_to_search=8, query_block=64,
        )
        treedir = str(tmp_path / "a.treedir")
        nn.save_tree(treedir)
        nn2 = NearestNeighborSearchApprox.load_tree(
            treedir, n_neighbors=k, num_leaves_to_search=8,
            query_block=64, quantization="int8_asym",
        )
        assert nn2.int8_asym
        v1, i1, _ = nn.search_with_labels(jnp.asarray(q), k)
        v2, i2, _ = nn2.search_with_labels(jnp.asarray(q), k)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-6
        )

    def test_asym_engine_flow(self, tmp_path):
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.synthetic import make_voc_fixture
        from hbird_tpu.data.transforms import get_hbird_val_transforms
        from hbird_tpu.models import FeatureExtractorSimple
        from hbird_tpu import HbirdEvaluation

        root = str(tmp_path / "voc")
        make_voc_fixture(
            root, n_train=6, n_val=3, size=(48, 32), colorize=True,
            seed=0, class_pool=[1, 2, 3],
        )
        INPUT, PATCH = 32, 4
        s = INPUT // PATCH

        def fn(model, imgs):
            b, c, h, w = imgs.shape
            x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
            return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

        va = get_hbird_val_transforms(INPUT)
        ds, _ = get_dataset("voc", root, 3, 0, va, va, None, None)
        fe = FeatureExtractorSimple(
            None, fn, eval_spatial_resolution=s, d_model=3
        )
        ev = HbirdEvaluation(
            fe, ds.train_dataloader(), num_classes=21, n_neighbours=3,
            nn_method="exact",
            nn_params={"quantization": "int8_asym"}, seed=1,
        )
        assert ev.NN_algorithm.int8_asym
        miou = ev.evaluate(ds.val_dataloader(), s, ignore_index=255)
        assert np.isfinite(float(miou))
