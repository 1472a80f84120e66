"""ScaNN score_ah knobs made real (round 5).

The reference's ScaNN config is tree(...).score_ah(2, threshold=0.2,
dimensions_per_block=4).reorder(...) (reference
hbird/nn/search_scann.py:26-32). On the per-row int8 modes both knobs
now do what their names say:

- dimensions_per_block -> per-column-BLOCK scales, separable with the
  per-row scales (dequantization = codes * s_row * c_col). The search
  path folds c_col into the queries so the Pallas kernels are untouched
  and scores remain exact dequantized dot products.
- anisotropic_quantization_threshold -> per-row scale selection
  minimizing the ScaNN anisotropic loss (parallel residual weighted by
  eta = (d-1) T^2 / (1 - T^2)); smaller scales trade clipping of the
  largest dims for finer resolution everywhere else.
"""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
from hbird_tpu.ops.quantize import (
    block_column_scales,
    quantize_bank_int8,
    quantize_bank_int8_ah,
    quantize_codes_aniso,
)


def _recall(idx, ref_idx):
    k = idx.shape[1]
    return np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / k for i in range(idx.shape[0])
    ])


def _block_hetero_bank(rng, m, d, dpb):
    """Columns spanning 2 decades of dynamic range ACROSS blocks (the
    regime per-row scales cannot fix: small-range columns lose their
    int8 resolution to the row's largest dim). Queries are inversely
    scaled so every block carries equal score signal."""
    nb = d // dpb
    col_factor = np.repeat(
        10.0 ** np.linspace(-2, 0, nb), dpb
    ).astype(np.float32)
    bank = rng.normal(size=(m, d)).astype(np.float32) * col_factor
    return bank, col_factor


def _hetero_queries(rng, q_n, d, col_factor):
    return (
        rng.normal(size=(q_n, d)).astype(np.float32) / col_factor
    ).astype(np.float32)


def _aniso_loss(bank, codes, scale, col, threshold):
    """Host-side anisotropic loss per row (oracle for the refinement)."""
    d = bank.shape[1]
    t2 = threshold ** 2
    eta = (d - 1) * t2 / (1 - t2)
    deq = codes.astype(np.float32) * scale
    if col is not None:
        deq = deq * col
    r = deq - bank
    norm2 = np.maximum((bank * bank).sum(1, keepdims=True), 1e-12)
    par_coef = (r * bank).sum(1, keepdims=True) / norm2
    par2 = par_coef ** 2 * norm2
    return (eta * par2 + ((r * r).sum(1, keepdims=True) - par2))[:, 0]


class TestQuantizerCore:
    def test_block_column_scales_shape_blocks_nondivisible(self):
        rng = np.random.default_rng(0)
        d, dpb = 30, 4  # 8 blocks, last one ragged
        bank = rng.normal(size=(256, d)).astype(np.float32)
        bank[:, :4] *= 100.0  # block 0 dominates -> its scale is 1
        c = np.asarray(block_column_scales(jnp.asarray(bank), dpb))
        assert c.shape == (d,)
        assert np.isclose(c[:4].max(), 1.0)
        # Constant within each block.
        for b in range(d // dpb):
            blk = c[b * dpb : (b + 1) * dpb]
            assert np.all(blk == blk[0])
        assert np.all(c > 0)

    def test_separable_dequant_recovers_small_columns(self):
        rng = np.random.default_rng(1)
        m, d, dpb = 2048, 64, 4
        bank, col_factor = _block_hetero_bank(rng, m, d, dpb)
        codes_r, s_r = quantize_bank_int8(jnp.asarray(bank), per_row=True)
        codes_a, s_a, c = quantize_bank_int8_ah(
            jnp.asarray(bank), dims_per_block=dpb
        )
        assert np.asarray(codes_a).dtype == np.int8
        err_rows = np.abs(
            np.asarray(codes_r, np.float32) * np.asarray(s_r) - bank
        )
        err_ah = np.abs(
            np.asarray(codes_a, np.float32)
            * np.asarray(s_a)
            * np.asarray(c)
            - bank
        )
        # RELATIVE error on the smallest columns: per-row-only loses them
        # to the row max; the block scales keep their resolution.
        small = col_factor < 0.05
        rel_rows = err_rows[:, small].mean() / np.abs(bank[:, small]).mean()
        rel_ah = err_ah[:, small].mean() / np.abs(bank[:, small]).mean()
        assert rel_ah < rel_rows / 5, (rel_ah, rel_rows)

    def test_aniso_codes_never_increase_loss(self):
        # eta = (d-1) T^2/(1-T^2) must be >> 1 for direction-aware
        # rounding to beat nearest (measured: d=768/T=0.2 — the ViT
        # regime — cuts the parallel residual to 6%; d=32 is inert).
        rng = np.random.default_rng(2)
        m, d, t = 1024, 128, 0.4
        bank = rng.normal(size=(m, d)).astype(np.float32)
        bank *= 10.0 ** rng.uniform(-1, 0, size=(m, 1)).astype(np.float32)
        bank_j = jnp.asarray(bank)
        scale = (
            jnp.maximum(jnp.abs(bank_j).max(axis=1, keepdims=True), 1e-12)
            / 127.0
        )
        refined = np.asarray(quantize_codes_aniso(bank_j, scale, t))
        nearest = np.clip(
            np.round(bank / np.asarray(scale)), -127, 127
        ).astype(np.int8)
        loss_near = _aniso_loss(bank, nearest, np.asarray(scale), None, t)
        loss_ref = _aniso_loss(bank, refined, np.asarray(scale), None, t)
        # Per-row never worse than round-to-nearest (selected per row)...
        assert np.all(loss_ref <= loss_near + 1e-6)
        # ...and the refinement genuinely moves codes and loss.
        assert np.mean(np.any(refined != nearest, axis=1)) > 0.5
        assert loss_ref.mean() < 0.95 * loss_near.mean()
        # The PARALLEL residual (the score-biasing part) shrinks hard.
        norm2 = np.maximum((bank * bank).sum(1, keepdims=True), 1e-12)

        def par2(codes):
            r = codes.astype(np.float32) * np.asarray(scale) - bank
            a = (r * bank).sum(1, keepdims=True) / norm2
            return (a ** 2 * norm2).mean()

        assert par2(refined) < 0.25 * par2(nearest)

    def test_row_block_chunking_matches_unchunked(self):
        rng = np.random.default_rng(3)
        bank = jnp.asarray(
            rng.normal(size=(300, 16)).astype(np.float32)
        )
        a = quantize_bank_int8_ah(
            bank, dims_per_block=4, aniso_threshold=0.2, row_block=None
        )
        b = quantize_bank_int8_ah(
            bank, dims_per_block=4, aniso_threshold=0.2, row_block=64
        )
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_allclose(
            np.asarray(a[1]), np.asarray(b[1]), rtol=1e-7
        )
        np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


class TestKnobWiring:
    def test_knobs_warn_without_int8_mode(self, caplog):
        rng = np.random.default_rng(4)
        bank = rng.normal(size=(256, 16)).astype(np.float32)
        with caplog.at_level(
            logging.WARNING, logger="hbird_tpu.nn.search_approx"
        ):
            nn = NearestNeighborSearchApprox(
                bank, n_neighbors=4, dimensions_per_block=4,
                query_block=64, bank_block=256,
            )
        assert nn.dims_per_block is None
        assert any("int8_rows" in r.message for r in caplog.records)

    def test_knob_validation(self):
        rng = np.random.default_rng(5)
        bank = rng.normal(size=(256, 16)).astype(np.float32)
        with pytest.raises(ValueError):
            NearestNeighborSearchApprox(
                bank, quantization="int8_asym", dimensions_per_block=0
            )
        with pytest.raises(ValueError):
            NearestNeighborSearchApprox(
                bank,
                quantization="int8_rows",
                anisotropic_quantization_threshold=1.5,
            )

    def test_flat_recall_improves_with_blocks(self):
        rng = np.random.default_rng(6)
        m, d, dpb, q_n, k = 8192, 64, 4, 512, 10
        bank, col_factor = _block_hetero_bank(rng, m, d, dpb)
        q = _hetero_queries(rng, q_n, d, col_factor)
        common = dict(n_neighbors=k, query_block=64, bank_block=512)
        exact = NearestNeighborSearchApprox(bank, use_fp16=False, **common)
        plain = NearestNeighborSearchApprox(
            bank, quantization="int8_asym", **common
        )
        ah = NearestNeighborSearchApprox(
            bank, quantization="int8_asym", dimensions_per_block=dpb,
            **common
        )
        assert ah.dims_per_block == dpb
        assert ah._bank_col_scale is not None
        idx_e = exact.find_nearest_neighbors(q, k)[0]
        idx_p = plain.find_nearest_neighbors(q, k)[0]
        idx_a = ah.find_nearest_neighbors(q, k)[0]
        r_plain, r_ah = _recall(idx_p, idx_e), _recall(idx_a, idx_e)
        # Half the score signal lives in columns the per-row scheme
        # quantizes to ~1 bit; the block scales recover it.
        assert r_ah > r_plain + 0.05, (r_ah, r_plain)
        assert r_ah >= 0.95, r_ah

    def test_flat_scores_are_dequantized_dots(self):
        rng = np.random.default_rng(7)
        m, d, dpb, q_n, k = 2048, 32, 4, 128, 8
        bank, col_factor = _block_hetero_bank(rng, m, d, dpb)
        q = _hetero_queries(rng, q_n, d, col_factor)
        ah = NearestNeighborSearchApprox(
            bank, n_neighbors=k, quantization="int8_asym",
            dimensions_per_block=dpb, query_block=64, bank_block=512,
        )
        idx, vals = ah.find_nearest_neighbors(q, k)
        codes = np.asarray(ah.feature_memory, np.float32)
        deq = codes * np.asarray(ah._bank_row_scale) * np.asarray(
            ah._bank_col_scale
        )
        # bf16 queries: tolerate the cast in the oracle comparison.
        s_ref = q.astype(np.float32) @ deq.T
        ref = np.take_along_axis(
            s_ref, np.asarray(idx, np.int64), axis=1
        )
        np.testing.assert_allclose(np.asarray(vals), ref, rtol=2e-2,
                                   atol=2e-2)

    def test_aniso_threshold_recall_sane(self):
        rng = np.random.default_rng(8)
        m, d, q_n, k = 4096, 64, 256, 10
        bank = rng.normal(size=(m, d)).astype(np.float32)
        bank *= 10.0 ** rng.uniform(-1.5, 0, size=(m, 1)).astype(np.float32)
        q = rng.normal(size=(q_n, d)).astype(np.float32)
        common = dict(n_neighbors=k, query_block=64, bank_block=512)
        exact = NearestNeighborSearchApprox(bank, use_fp16=False, **common)
        an = NearestNeighborSearchApprox(
            bank, quantization="int8_asym",
            anisotropic_quantization_threshold=0.2, **common
        )
        assert an.aniso_threshold == 0.2
        idx_e = exact.find_nearest_neighbors(q, k)[0]
        idx_a = an.find_nearest_neighbors(q, k)[0]
        assert _recall(idx_a, idx_e) >= 0.97

    def test_tree_full_probe_with_blocks(self):
        rng = np.random.default_rng(9)
        m, d, dpb, q_n, k = 4096, 32, 4, 256, 8
        bank, col_factor = _block_hetero_bank(rng, m, d, dpb)
        labels = rng.uniform(size=(m, 4)).astype(np.float32)
        q = _hetero_queries(rng, q_n, d, col_factor)
        common = dict(
            n_neighbors=k, label_memory=labels, use_tree=True,
            num_leaves=8, num_leaves_to_search=8, query_block=64,
        )
        exact = NearestNeighborSearchApprox(bank, use_fp16=False, **common)
        plain = NearestNeighborSearchApprox(
            bank, quantization="int8_asym", **common
        )
        ah = NearestNeighborSearchApprox(
            bank, quantization="int8_asym", dimensions_per_block=dpb,
            anisotropic_quantization_threshold=0.2, **common
        )
        idx_e = exact.find_nearest_neighbors(q, k)[0]
        idx_p = plain.find_nearest_neighbors(q, k)[0]
        idx_a = ah.find_nearest_neighbors(q, k)[0]
        # Full probe budget: the gap is pure quantization error.
        assert _recall(idx_a, idx_e) > _recall(idx_p, idx_e) + 0.05
        assert _recall(idx_a, idx_e) >= 0.95

    def test_treedir_roundtrip_preserves_col_scale(self, tmp_path):
        rng = np.random.default_rng(10)
        m, d, dpb, k = 2048, 32, 4, 8
        bank, col_factor = _block_hetero_bank(rng, m, d, dpb)
        labels = rng.uniform(size=(m, 4)).astype(np.float32)
        q = _hetero_queries(rng, 64, d, col_factor)
        nn = NearestNeighborSearchApprox(
            bank, n_neighbors=k, label_memory=labels, use_tree=True,
            quantization="int8_asym", dimensions_per_block=dpb,
            num_leaves=8, num_leaves_to_search=8, query_block=64,
        )
        treedir = str(tmp_path / "ah.treedir")
        nn.save_tree(treedir)
        nn2 = NearestNeighborSearchApprox.load_tree(
            treedir, n_neighbors=k, num_leaves_to_search=8,
            query_block=64, quantization="int8_asym",
        )
        assert nn2._bank_col_scale is not None
        np.testing.assert_array_equal(
            np.asarray(nn._bank_col_scale), np.asarray(nn2._bank_col_scale)
        )
        v1, i1, _ = nn.search_with_labels(jnp.asarray(q), k)
        v2, i2, _ = nn2.search_with_labels(jnp.asarray(q), k)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
        # state_spec mirrors device_state for the loaded twin (AOT match).
        assert "bank_col_scale" in nn2.state_spec(m)
        assert "bank_col_scale" in nn2.device_state

    def test_meshed_tree_with_blocks_matches_single_device(self):
        from hbird_tpu.parallel import make_mesh

        rng = np.random.default_rng(11)
        m, d, dpb, q_n, k = 4096, 32, 4, 256, 8
        bank, col_factor = _block_hetero_bank(rng, m, d, dpb)
        labels = rng.uniform(size=(m, 4)).astype(np.float32)
        q = _hetero_queries(rng, q_n, d, col_factor)
        common = dict(
            n_neighbors=k, label_memory=labels, use_tree=True,
            quantization="int8_asym", dimensions_per_block=dpb,
            num_leaves=8, num_leaves_to_search=8, query_block=64,
        )
        single = NearestNeighborSearchApprox(bank, **common)
        mesh = make_mesh((4,), ("bank",))
        meshed = NearestNeighborSearchApprox(bank, mesh=mesh, **common)
        np.testing.assert_allclose(
            np.asarray(single._bank_col_scale),
            np.asarray(meshed._bank_col_scale),
            rtol=1e-6,
        )
        vs, is_, _ = single.search_with_labels(jnp.asarray(q), k)
        vm, im, _ = meshed.search_with_labels(jnp.asarray(q), k)
        np.testing.assert_allclose(
            np.sort(np.asarray(vs), 1), np.sort(np.asarray(vm), 1),
            rtol=1e-4, atol=1e-5,
        )


class TestScaNNLiteralConfig:
    def test_reference_literal_params(self):
        """The reference's exact searcher spec (search_scann.py:26-32):
        tree(num_leaves, num_leaves_to_search) + score_ah(2,
        anisotropic_quantization_threshold=0.2, dimensions_per_block=4)
        + reorder(C) — every knob consumed."""
        rng = np.random.default_rng(12)
        m, d, q_n, k = 4096, 32, 256, 8
        bank, col_factor = _block_hetero_bank(rng, m, d, 4)
        q = _hetero_queries(rng, q_n, d, col_factor)
        nn = NearestNeighborSearchApprox(
            bank,
            n_neighbors=k,
            use_tree=True,
            num_leaves=8,
            num_leaves_to_search=8,
            anisotropic_quantization_threshold=0.2,
            dimensions_per_block=4,
            num_reordering_candidates=3 * k,
            quantization="int8_asym",
            query_block=64,
        )
        assert nn.dims_per_block == 4 and nn.aniso_threshold == 0.2
        exact = NearestNeighborSearchApprox(
            bank, n_neighbors=k, use_tree=True, num_leaves=8,
            num_leaves_to_search=8, use_fp16=False, query_block=64,
        )
        idx_e = exact.find_nearest_neighbors(q, k)[0]
        idx = nn.find_nearest_neighbors(q, k)[0]
        assert _recall(idx, idx_e) >= 0.95
