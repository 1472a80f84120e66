"""Built-tree persistence (.treedir): serialize/reload a CONSTRUCTED IVF
index — the ScaNN searcher-serialization counterpart (the reference
rebuilds its tree every run from the flat bank,
reference hbird/nn/search_scann.py:21-33). A reload must return
bit-equal search results without re-running k-means/layout/scatter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hbird_tpu.bank.io import is_tree_path, load_tree_state, tree_path_on_disk
from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
from hbird_tpu.parallel import make_mesh


def _clustered(m, d, n_clusters, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 3
    x = centers[rng.integers(0, n_clusters, m)]
    x = x + rng.normal(size=(m, d)).astype(np.float32) * 0.3
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def fixture():
    m, d, c = 2000, 32, 5
    x = _clustered(m, d, 8, seed=11)
    rng = np.random.default_rng(12)
    labels = rng.random((m, c)).astype(np.float32)
    q = x[rng.integers(0, m, 150)] + 0.02 * rng.normal(
        size=(150, d)
    ).astype(np.float32)
    return x, labels, jnp.asarray(q)


def _build(x, labels, **kw):
    kw.setdefault("num_leaves", 8)
    kw.setdefault("num_leaves_to_search", 4)
    kw.setdefault("query_block", 64)
    return NearestNeighborSearchApprox(
        x, n_neighbors=10, label_memory=jnp.asarray(labels),
        use_tree=True, **kw,
    )


class TestRoundtrip:
    @pytest.mark.parametrize("use_int8,use_fp16", [
        (False, True),   # bf16 slabs (uint16 storage path)
        (False, False),  # f32 slabs
        (True, True),    # int8 slabs + scale
    ])
    def test_search_bitequal_after_reload(
        self, fixture, tmp_path, use_int8, use_fp16
    ):
        x, labels, q = fixture
        nn = _build(x, labels, use_int8=use_int8, use_fp16=use_fp16)
        path = str(tmp_path / "idx.treedir")
        out = nn.save_tree(path)
        assert out == path and is_tree_path(path)
        assert tree_path_on_disk(path) == path

        nn2 = NearestNeighborSearchApprox.load_tree(
            path, n_neighbors=10, num_leaves_to_search=4, query_block=64
        )
        assert nn2.use_tree and nn2.use_int8 == use_int8
        assert nn2.bank.dtype == nn.bank.dtype
        v1, i1, l1 = nn.search_with_labels(q, 10)
        v2, i2, l2 = nn2.search_with_labels(q, 10)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(
            np.asarray(v1, np.float32), np.asarray(v2, np.float32)
        )
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_state_roundtrip_fields(self, fixture, tmp_path):
        x, labels, q = fixture
        nn = _build(x, labels)
        path = str(tmp_path / "idx.treedir")
        nn.save_tree(path, chunk_rows=700)  # multiple chunks
        st = load_tree_state(path)
        np.testing.assert_array_equal(
            np.asarray(st["perm"]), np.asarray(nn.perm)
        )
        np.testing.assert_array_equal(
            np.asarray(st["slots"]), np.asarray(nn.slots)
        )
        np.testing.assert_array_equal(
            np.asarray(st["leaf_valid"]), np.asarray(nn.leaf_valid)
        )
        np.testing.assert_allclose(
            np.asarray(st["centroids"]), np.asarray(nn.centroids),
            rtol=1e-6, atol=1e-7,
        )
        np.testing.assert_array_equal(
            np.asarray(st["ivf_bank"], np.float32),
            np.asarray(nn.bank, np.float32),
        )
        assert st["cap"] == nn._cap and st["valid_rows"] == nn.valid_rows

    def test_save_requires_built_tree(self, fixture, tmp_path):
        x, labels, _ = fixture
        flat = NearestNeighborSearchApprox(
            x, n_neighbors=10, label_memory=jnp.asarray(labels),
        )
        with pytest.raises(ValueError, match="BUILT tree"):
            flat.save_tree(str(tmp_path / "x.treedir"))


class TestMeshedLoad:
    def test_load_onto_mesh_matches_single_device(self, fixture, tmp_path):
        x, labels, q = fixture
        nn = _build(x, labels)
        path = str(tmp_path / "idx.treedir")
        nn.save_tree(path)

        mesh = make_mesh((4,), ("bank",))
        nn_m = NearestNeighborSearchApprox.load_tree(
            path, n_neighbors=10, mesh=mesh,
            # Full probe: per-shard probing (shard_probe='split') scans
            # different leaf unions than single-device at partial probe;
            # full probe pins value-exact agreement.
            num_leaves_to_search=8, query_block=64,
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert nn_m.bank.sharding.is_equivalent_to(
            NamedSharding(mesh, P("bank")), 2
        )
        nn1 = _build(x, labels, num_leaves_to_search=8)
        v1, i1, _ = nn1.search_with_labels(q, 10)
        vm, im, lm = nn_m.search_with_labels(q, 10)
        np.testing.assert_allclose(
            np.asarray(vm, np.float32), np.asarray(v1, np.float32),
            rtol=1e-5, atol=1e-6,
        )
        idx = np.asarray(im)
        assert (idx >= 0).all() and (idx < x.shape[0]).all()
        np.testing.assert_allclose(np.asarray(lm), labels[idx], atol=1e-6)

    def test_misaligned_mesh_rejected(self, fixture, tmp_path):
        x, labels, _ = fixture
        nn = _build(x, labels, num_leaves=6)  # 6 leaves, mesh p=4
        path = str(tmp_path / "idx6.treedir")
        nn.save_tree(path)
        mesh = make_mesh((4,), ("bank",))
        with pytest.raises(ValueError, match="straddle"):
            NearestNeighborSearchApprox.load_tree(path, mesh=mesh)


INPUT = 32
PATCH = 4
S = INPUT // PATCH


def _oracle_fn(model, imgs):
    """Per-patch mean color — (B, S*S, 3)."""
    b, c, h, w = imgs.shape
    s = h // PATCH
    x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
    return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None


class TestEngineTreedir:
    def test_engine_save_then_load(self, tmp_path):
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.synthetic import make_voc_fixture
        from hbird_tpu.data.transforms import get_hbird_val_transforms
        from hbird_tpu.hbird_eval import HbirdEvaluation
        from hbird_tpu.models.extractor import FeatureExtractorSimple

        root = str(tmp_path / "voc")
        make_voc_fixture(
            root, n_train=12, n_val=6, size=(64, 48), colorize=True,
            seed=3, class_pool=[1, 2, 3, 4, 5],
        )
        va = get_hbird_val_transforms(INPUT)
        fe = FeatureExtractorSimple(
            None, _oracle_fn, eval_spatial_resolution=S, d_model=3
        )
        ds, _ = get_dataset("voc", root, 4, 0, va, va, None, None)
        path = str(tmp_path / "engine.treedir")
        nn_params = {
            "num_leaves": 4, "num_leaves_to_search": 4, "query_block": 16,
        }

        def make(f_mem_p=None):
            return HbirdEvaluation(
                fe, ds.train_dataloader(), num_classes=21, n_neighbours=5,
                nn_method="ivf", nn_params=dict(nn_params), f_mem_p=f_mem_p,
            )

        ev = make(f_mem_p=path)
        assert tree_path_on_disk(path)
        miou1 = ev.evaluate(ds.val_dataloader(), S)

        ev2 = make(f_mem_p=path)
        assert ev2.load_memory()  # swaps in the deserialized index
        assert ev2.NN_algorithm.use_tree
        miou2 = ev2.evaluate(ds.val_dataloader(), S)
        assert abs(float(miou1) - float(miou2)) < 1e-6, (miou1, miou2)

    def test_engine_load_memory_flag_skips_build(self, tmp_path):
        """HbirdEvaluation(load_memory=True) restores the persisted index
        in __init__ and never touches the train loader; identical mIoU."""
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.synthetic import make_voc_fixture
        from hbird_tpu.data.transforms import get_hbird_val_transforms
        from hbird_tpu.hbird_eval import HbirdEvaluation
        from hbird_tpu.models.extractor import FeatureExtractorSimple

        root = str(tmp_path / "voc")
        make_voc_fixture(
            root, n_train=10, n_val=4, size=(64, 48), colorize=True,
            seed=9, class_pool=[1, 2, 3],
        )
        va = get_hbird_val_transforms(INPUT)
        fe = FeatureExtractorSimple(
            None, _oracle_fn, eval_spatial_resolution=S, d_model=3
        )
        ds, _ = get_dataset("voc", root, 4, 0, va, va, None, None)
        path = str(tmp_path / "idx.treedir")
        nn_params = {"num_leaves": 4, "num_leaves_to_search": 4,
                     "query_block": 16}
        ev = HbirdEvaluation(
            fe, ds.train_dataloader(), num_classes=21, n_neighbours=5,
            nn_method="ivf", nn_params=dict(nn_params), f_mem_p=path,
        )
        miou1 = ev.evaluate(ds.val_dataloader(), S)

        def exploding_loader():
            raise AssertionError("train loader touched on a load path")
            yield  # pragma: no cover

        ev2 = HbirdEvaluation(
            fe, exploding_loader(), num_classes=21, n_neighbours=5,
            nn_method="ivf", nn_params=dict(nn_params), f_mem_p=path,
            load_memory=True,
        )
        assert ev2.NN_algorithm.use_tree
        miou2 = ev2.evaluate(ds.val_dataloader(), S)
        assert abs(float(miou1) - float(miou2)) < 1e-6, (miou1, miou2)

        # Missing file -> falls back to building (and here the loader
        # explodes, proving the fallback really builds).
        with pytest.raises(AssertionError, match="train loader touched"):
            HbirdEvaluation(
                fe, exploding_loader(), num_classes=21, n_neighbours=5,
                nn_method="ivf", nn_params=dict(nn_params),
                f_mem_p=str(tmp_path / "absent.treedir"), load_memory=True,
            )

    def test_treedir_does_not_skip_label_save(self, tmp_path):
        """Review finding: the .treedir early return must not swallow the
        independent l_mem_p label save, and a non-tree backend asked for
        a tree save must persist the flat memory (as .flat.npy) instead
        of silently losing the build."""
        import os

        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.synthetic import make_voc_fixture
        from hbird_tpu.data.transforms import get_hbird_val_transforms
        from hbird_tpu.hbird_eval import HbirdEvaluation
        from hbird_tpu.models.extractor import FeatureExtractorSimple

        root = str(tmp_path / "voc")
        make_voc_fixture(
            root, n_train=8, n_val=2, size=(64, 48), colorize=True,
            seed=5, class_pool=[1, 2],
        )
        va = get_hbird_val_transforms(INPUT)
        fe = FeatureExtractorSimple(
            None, _oracle_fn, eval_spatial_resolution=S, d_model=3
        )
        ds, _ = get_dataset("voc", root, 4, 0, va, va, None, None)
        tree_p = str(tmp_path / "t.treedir")
        lab_p = str(tmp_path / "labels.npy")
        ev = HbirdEvaluation(
            fe, ds.train_dataloader(), num_classes=21, n_neighbours=5,
            nn_method="ivf",
            nn_params={"num_leaves": 4, "num_leaves_to_search": 4,
                       "query_block": 16},
            f_mem_p=tree_p, l_mem_p=lab_p,
        )
        assert os.path.isfile(lab_p)  # label save not skipped
        np.testing.assert_allclose(np.load(lab_p), ev.label_memory, atol=0)
        assert tree_path_on_disk(tree_p)

        # Non-tree backend + .treedir path: flat memory saved as .flat.npy.
        tree_p2 = str(tmp_path / "t2.treedir")
        ev2 = HbirdEvaluation(
            fe, ds.train_dataloader(), num_classes=21, n_neighbours=5,
            nn_method="exact", f_mem_p=tree_p2,
        )
        assert not tree_path_on_disk(tree_p2)
        assert os.path.isfile(tree_p2 + ".flat.npy")
        np.testing.assert_allclose(
            np.load(tree_p2 + ".flat.npy"), ev2.feature_memory, atol=0
        )

    def test_meshed_load_with_recall_target_calibrates(
        self, fixture, tmp_path
    ):
        """recall_target on a meshed treedir load calibrates through the
        sharded search path (it used to trip calibrate_n_probe's
        single-device assert)."""
        x, labels, q = fixture
        nn = _build(x, labels)
        path = str(tmp_path / "idx.treedir")
        nn.save_tree(path)

        from hbird_tpu.hbird_eval import HbirdEvaluation

        mesh = make_mesh((1, 4), ("data", "bank"))
        ev = HbirdEvaluation.__new__(HbirdEvaluation)
        ev.f_mem_p = path
        ev.l_mem_p = None
        ev.mesh = mesh
        ev.n_neighbours = 10
        ev.nn_params = {"recall_target": 0.9, "query_block": 64}
        ev.nn_method = "ivf"
        assert ev.load_memory()
        assert ev.NN_algorithm.use_tree
        assert 1 <= ev.NN_algorithm.num_leaves_to_search <= 8
        v, i, _ = ev.NN_algorithm.search_with_labels(q, 10)
        assert np.isfinite(np.asarray(v, np.float32)).all()
