"""Round-5 second review pass: per-row scale injection, asym
persistence, flat col-scale dequantization, adapter register tokens.

Pins the four library-level findings of the final-round code review:

- from_tree_state with an explicit per-row quantization kwarg but no
  bank_row_scale must refuse loudly (it used to keep the 2-row dummy
  build's garbage scales and crash/shape-assert at search time),
- from_bankdir must reject BOTH per-row modes (streamed builds have no
  place to measure per-row scales), not just 'int8_rows',
- a .treedir saved from an int8_asym tree must reload as int8_asym
  without the caller re-passing the kwarg (the scoring mode is part of
  the saved index, not a search-time knob),
- the FLAT (non-tree) gather_features_pure must apply score_ah column
  scales like the tree override (dequantization = codes*s_row*c_col),
- torch-adapter CLS attention must drop register tokens so the map
  aligns with the patch grid.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox


def _col_hetero_bank(rng, m, d, dpb):
    nb = d // dpb
    col_factor = np.repeat(
        10.0 ** np.linspace(-2, 0, nb), dpb
    ).astype(np.float32)
    return rng.normal(size=(m, d)).astype(np.float32) * col_factor


def _small_asym_tree(rng, m=512, d=32, k=8):
    bank = _col_hetero_bank(rng, m, d, 4)
    labels = rng.uniform(size=(m, 4)).astype(np.float32)
    return bank, labels, NearestNeighborSearchApprox(
        bank, n_neighbors=k, label_memory=labels, use_tree=True,
        quantization="int8_asym", dimensions_per_block=4, num_leaves=4,
        num_leaves_to_search=4, query_block=64,
    )


class TestRowScaleInjection:
    def test_from_tree_state_rejects_missing_row_scale(self):
        rng = np.random.default_rng(0)
        _, _, nn = _small_asym_tree(rng)
        with pytest.raises(ValueError, match="bank_row_scale"):
            NearestNeighborSearchApprox.from_tree_state(
                nn.bank, nn.labels, nn.centroids, nn.leaf_valid,
                nn.perm, nn.slots, cap=nn._cap,
                valid_rows=nn.valid_rows, n_neighbors=8,
                bank_scale=0.01, quantization="int8_asym",
            )

    def test_from_tree_state_injection_matches_builder(self):
        rng = np.random.default_rng(1)
        _, _, nn = _small_asym_tree(rng)
        q = rng.normal(size=(32, 32)).astype(np.float32) / np.repeat(
            10.0 ** np.linspace(-2, 0, 8), 4
        ).astype(np.float32)
        inj = NearestNeighborSearchApprox.from_tree_state(
            nn.bank, nn.labels, nn.centroids, nn.leaf_valid,
            nn.perm, nn.slots, cap=nn._cap, valid_rows=nn.valid_rows,
            n_neighbors=8, bank_row_scale=nn._bank_row_scale,
            bank_col_scale=nn._bank_col_scale,
            quantization="int8_asym", num_leaves_to_search=4,
            query_block=64,
        )
        assert inj.int8_asym
        v1, i1, _ = nn.search_with_labels(jnp.asarray(q), 8)
        v2, i2, _ = inj.search_with_labels(jnp.asarray(q), 8)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-6
        )

    def test_from_bankdir_rejects_per_row_modes(self, tmp_path):
        from hbird_tpu.bank.io import save_memory_sharded

        rng = np.random.default_rng(2)
        fdir = str(tmp_path / "feats.bankdir")
        save_memory_sharded(
            rng.normal(size=(64, 32)).astype(np.float32), fdir
        )
        for qz in ("int8_rows", "int8_asym"):
            with pytest.raises(ValueError, match="streamed"):
                NearestNeighborSearchApprox.from_bankdir(
                    fdir, quantization=qz, num_leaves=4
                )


class TestAsymPersistence:
    def test_treedir_reload_preserves_asym_without_kwargs(self, tmp_path):
        rng = np.random.default_rng(3)
        _, _, nn = _small_asym_tree(rng)
        q = rng.normal(size=(32, 32)).astype(np.float32)
        treedir = str(tmp_path / "a.treedir")
        nn.save_tree(treedir)
        nn2 = NearestNeighborSearchApprox.load_tree(
            treedir, n_neighbors=8, num_leaves_to_search=4, query_block=64
        )
        assert nn2.int8_asym, (
            "reload silently downgraded int8_asym to symmetric scoring"
        )
        v1, i1, _ = nn.search_with_labels(jnp.asarray(q), 8)
        v2, i2, _ = nn2.search_with_labels(jnp.asarray(q), 8)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-6
        )


class TestFlatColScaleGather:
    def test_flat_gather_dequantizes_col_scales(self):
        rng = np.random.default_rng(4)
        bank = _col_hetero_bank(rng, 256, 32, 4)
        nn = NearestNeighborSearchApprox(
            bank, n_neighbors=8, quantization="int8_asym",
            dimensions_per_block=4, query_block=64, bank_block=128,
        )
        assert not nn.use_tree
        state = nn.device_state
        assert "bank_col_scale" in state
        rows = np.asarray(
            nn.gather_features_pure(state, jnp.arange(32)), np.float32
        )
        # Round-to-nearest bound: |x - codes*s_row*c_col| <= 0.5*s_row*c_col
        # elementwise (plus clipping, which this geometry doesn't hit).
        bound = (
            0.51
            * np.asarray(state["bank_row_scale"], np.float32)[:32]
            * np.asarray(state["bank_col_scale"], np.float32)[None, :]
        )
        assert np.all(np.abs(rows - bank[:32]) <= bound), (
            "flat gather returned rows missing the column-scale factor"
        )


class TestAdapterRegisterTokens:
    def test_cls_attention_drops_register_tokens(self):
        torch = pytest.importorskip("torch")
        from hbird_tpu.models.torch_adapter import _cls_attention

        n_reg, n_patch = 4, 16
        n_tok = 1 + n_reg + n_patch

        class Out:
            attentions = [torch.rand(2, 3, n_tok, n_tok)]

        class Model:
            num_register_tokens = n_reg

        att = _cls_attention(Out(), Model(), None, return_attn=True)
        assert att.shape == (2, n_patch)
        # Registers dropped from the FRONT: the map equals the mean-head
        # slice starting after CLS+registers, min-max normalized.
        raw = Out.attentions[-1][:, :, 0, 1 + n_reg:].mean(dim=1).numpy()
        mins = raw.min(axis=-1, keepdims=True)
        maxs = raw.max(axis=-1, keepdims=True)
        np.testing.assert_allclose(
            att, (raw - mins) / np.maximum(maxs - mins, 1e-12), rtol=1e-5
        )

    def test_cls_attention_no_registers_unchanged(self):
        torch = pytest.importorskip("torch")
        from hbird_tpu.models.torch_adapter import _cls_attention

        class Out:
            attentions = [torch.rand(1, 2, 17, 17)]

        att = _cls_attention(Out(), object(), None, return_attn=True)
        assert att.shape == (1, 16)
