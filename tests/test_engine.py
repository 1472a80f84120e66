"""End-to-end engine tests on synthetic fixtures.

The 'oracle' setup: fixture images are deterministic colorizations of
their masks, and the feature extractor returns per-patch mean color — so
retrieval + label transfer must recover the segmentation, giving high
mIoU without any pretrained backbone. This exercises every layer: data,
transforms, memory build, kNN, cross-attention, upsample, metric.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hbird_tpu import HbirdEvaluation, hbird_evaluation
from hbird_tpu.data.synthetic import folder_to_tar, make_voc_fixture
from hbird_tpu.models import FeatureExtractorSimple
from hbird_tpu.parallel import make_mesh

INPUT = 32
PATCH = 4
S = INPUT // PATCH


def oracle_fn(model, imgs):
    """Per-patch mean color — (B, S*S, 3)."""
    b, c, h, w = imgs.shape
    s = h // PATCH
    x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
    return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None


@pytest.fixture(scope="module")
def voc_color(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc_color") / "voc")
    # Small class pool: the train memory certainly covers every val class.
    make_voc_fixture(
        root,
        n_train=12,
        n_val=6,
        size=(64, 48),
        colorize=True,
        seed=3,
        class_pool=[1, 2, 3, 4, 5],
    )
    return root


@pytest.fixture(scope="module")
def ceiling(voc_color):
    """Patch-level ceiling: mIoU of PERFECT label transfer pushed through
    the same soft-label -> bilinear-upsample -> argmax path. The pipeline
    cannot beat this (patch grid is 8x8 here, so boundary error dominates);
    absent classes score IoU 0 in the 21-class mean like the reference
    metric."""
    from hbird_tpu.core import patch_soft_labels, patchify_gt
    from hbird_tpu.data import get_dataset
    from hbird_tpu.data.transforms import get_hbird_val_transforms
    from hbird_tpu.utils.eval_metrics import PredsmIoU

    va = get_hbird_val_transforms(INPUT)
    ds, _ = get_dataset("voc", voc_color, 4, 0, va, va, None, None)
    m = PredsmIoU(21, 21, ignore_index=255)
    for x, y in ds.val_dataloader():
        ids = jnp.asarray((np.asarray(y) * 255).round().astype(np.int32))
        lab = patch_soft_labels(patchify_gt(ids, PATCH), 21)
        lh = jnp.transpose(lab, (0, 3, 1, 2))
        up = jax.image.resize(
            lh, (lh.shape[0], 21, INPUT, INPUT), method="bilinear", antialias=False
        )
        m.update(np.asarray(ids)[:, 0], np.asarray(jnp.argmax(up, axis=1)))
    return m.compute(is_global_zero=True)[0]


@pytest.fixture(autouse=True)
def _seed_global_rng():
    """Each test sees the same augmentation RNG stream regardless of test
    order (train transforms draw from the stdlib global RNG)."""
    import random as _random

    _random.seed(1234)
    yield


class TestEndToEnd:
    def test_oracle_miou_high(self, voc_color, ceiling):
        miou = hbird_evaluation(
            model=None,
            d_model=3,
            patch_size=PATCH,
            dataset_name="voc",
            data_dir=voc_color,
            batch_size=4,
            input_size=INPUT,
            augmentation_epoch=1,
            n_neighbours=5,
            nn_method="exact",
            ftr_extr_fn=oracle_fn,
            num_workers=0,
        )
        # >=55% of the perfect-transfer bound with 3-D color features under
        # full train-time augmentation exercises every layer correctly.
        assert float(miou) >= 0.55 * ceiling, (miou, ceiling)

    def test_bounded_memory_and_aug_epochs(self, voc_color, ceiling):
        miou = hbird_evaluation(
            model=None,
            d_model=3,
            patch_size=PATCH,
            dataset_name="voc",
            data_dir=voc_color,
            batch_size=4,
            input_size=INPUT,
            augmentation_epoch=2,
            n_neighbours=5,
            nn_method="exact",
            ftr_extr_fn=oracle_fn,
            memory_size=12 * 2 * 16,  # 16 sampled patches per image
            num_workers=0,
        )
        assert float(miou) >= 0.5 * ceiling, (miou, ceiling)

    def test_approx_backend(self, voc_color, ceiling):
        miou = hbird_evaluation(
            model=None,
            d_model=3,
            patch_size=PATCH,
            dataset_name="voc",
            data_dir=voc_color,
            batch_size=4,
            input_size=INPUT,
            n_neighbours=5,
            nn_method="scann",
            nn_params={"num_leaves": 16, "num_leaves_to_search": 8},
            ftr_extr_fn=oracle_fn,
            num_workers=0,
        )
        assert float(miou) >= 0.5 * ceiling, (miou, ceiling)

    @pytest.mark.parametrize("nn_method,nn_params", [
        ("exact", None),
        ("scann", None),
        ("ivf", {"num_leaves": 4, "num_leaves_to_search": 4,
                 "query_block": 16}),
    ])
    def test_knn_details(self, voc_color, nn_method, nn_params):
        miou, details = hbird_evaluation(
            model=None,
            d_model=3,
            patch_size=PATCH,
            dataset_name="voc",
            data_dir=voc_color,
            batch_size=4,
            input_size=INPUT,
            n_neighbours=5,
            nn_method=nn_method,
            nn_params=nn_params,
            ftr_extr_fn=oracle_fn,
            num_workers=0,
            return_knn_details=True,
        )
        assert details["knns"].shape == (6, S * S, 5, 3)
        assert details["knns_labels"].shape == (6, S * S, 5, 21)
        assert details["knns_ca_labels"].shape == (6, S * S, 21)

    def test_sharded_bank_matches_single(self, voc_color):
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.transforms import (
            get_hbird_train_transforms,
            get_hbird_val_transforms,
        )

        tr = get_hbird_train_transforms(INPUT)
        va = get_hbird_val_transforms(INPUT)
        fe = FeatureExtractorSimple(None, oracle_fn, eval_spatial_resolution=S, d_model=3)

        def build(mesh):
            import random

            random.seed(0)
            ds, ign = get_dataset("voc", voc_color, 4, 0, va, va, None, None)
            ev = HbirdEvaluation(
                fe,
                ds.train_dataloader(),
                num_classes=21,
                n_neighbours=5,
                mesh=mesh,
                seed=7,
            )
            return ev.evaluate(ds.val_dataloader(), S, ignore_index=255)

        miou_single = build(None)
        miou_sharded = build(make_mesh((4,), ("bank",)))
        assert miou_single == pytest.approx(miou_sharded, abs=1e-6)

    def test_memory_save_load(self, voc_color, tmp_path):
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.transforms import get_hbird_val_transforms

        va = get_hbird_val_transforms(INPUT)
        fe = FeatureExtractorSimple(None, oracle_fn, eval_spatial_resolution=S, d_model=3)
        ds, _ = get_dataset("voc", voc_color, 4, 0, va, va, None, None)
        f_p = str(tmp_path / "feat.npy")
        l_p = str(tmp_path / "lab.npy")
        ev = HbirdEvaluation(
            fe,
            ds.train_dataloader(),
            num_classes=21,
            n_neighbours=5,
            f_mem_p=f_p,
            l_mem_p=l_p,
        )
        saved = np.load(f_p)
        np.testing.assert_allclose(saved, ev.feature_memory, atol=0)
        # Norms are 1 (unbounded memory L2-normalizes).
        np.testing.assert_allclose(
            np.linalg.norm(saved, axis=1), np.ones(saved.shape[0]), rtol=1e-5
        )
        assert ev.load_memory()

    def test_torch_bank_injection(self, tmp_path):
        # Strict-parity hook: load a torch-saved bank.
        torch = pytest.importorskip("torch")
        from hbird_tpu.bank.io import load_memory, save_memory

        arr = np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32)
        p = str(tmp_path / "bank.pt")
        torch.save(torch.from_numpy(arr), p)
        out = load_memory(p)
        np.testing.assert_allclose(out, arr, atol=0)
        save_memory(arr, str(tmp_path / "bank2.pt"))
        np.testing.assert_allclose(load_memory(str(tmp_path / "bank2.pt")), arr, atol=0)

    def test_tar_end_to_end(self, voc_color, ceiling, tmp_path):
        tar = str(tmp_path / "voc.tar")
        folder_to_tar(voc_color, tar, "VOCSegmentation")
        miou = hbird_evaluation(
            model=None,
            d_model=3,
            patch_size=PATCH,
            dataset_name="voc",
            data_dir=tar,
            batch_size=4,
            input_size=INPUT,
            n_neighbours=5,
            nn_method="exact",
            ftr_extr_fn=oracle_fn,
            num_workers=2,
        )
        assert float(miou) >= 0.4 * ceiling, (miou, ceiling)

    def test_2d_mesh_data_and_bank(self, voc_color):
        # Full engine over a ('data','bank') mesh: batches sharded over
        # 'data', bank rows over 'bank'; result must match single-device.
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.transforms import get_hbird_val_transforms

        va = get_hbird_val_transforms(INPUT)
        fe = FeatureExtractorSimple(None, oracle_fn, eval_spatial_resolution=S, d_model=3)

        def build(mesh):
            import random

            random.seed(0)
            ds, _ = get_dataset("voc", voc_color, 4, 0, va, va, None, None)
            ev = HbirdEvaluation(
                fe, ds.train_dataloader(), num_classes=21, n_neighbours=5,
                mesh=mesh, seed=7,
            )
            return ev.evaluate(ds.val_dataloader(), S, ignore_index=255)

        miou_single = build(None)
        miou_2d = build(make_mesh((2, 4), ("data", "bank")))
        assert miou_single == pytest.approx(miou_2d, abs=1e-6)

    def test_mesh_ring_strategy_matches_single(self, voc_color):
        # Same engine run with the query-sharded ring merge.
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.transforms import get_hbird_val_transforms

        va = get_hbird_val_transforms(INPUT)
        fe = FeatureExtractorSimple(None, oracle_fn, eval_spatial_resolution=S, d_model=3)

        def build(mesh, nn_params=None):
            import random

            random.seed(0)
            ds, _ = get_dataset("voc", voc_color, 4, 0, va, va, None, None)
            ev = HbirdEvaluation(
                fe, ds.train_dataloader(), num_classes=21, n_neighbours=5,
                mesh=mesh, seed=7, nn_params=nn_params,
            )
            return ev.evaluate(ds.val_dataloader(), S, ignore_index=255)

        miou_single = build(None)
        miou_ring = build(
            make_mesh((8,), ("bank",)), {"shard_strategy": "ring"}
        )
        assert miou_single == pytest.approx(miou_ring, abs=1e-6)


class TestOtherDatasetsEndToEnd:
    """Engine wiring across the non-VOC datasets (random features; asserts
    the full pipeline runs and produces a sane metric, incl. each dataset's
    ignore-index semantics)."""

    @pytest.mark.parametrize(
        "name,maker,nc",
        [
            ("ade20k", "make_ade20k_fixture", 151),
            ("cityscapes", "make_cityscapes_fixture", 19),
            ("coco-stuff", "make_coco_fixture", 15),
            ("coco-thing", "make_coco_fixture", 12),
        ],
    )
    def test_engine_runs(self, tmp_path, name, maker, nc):
        import hbird_tpu.data.synthetic as syn

        root = str(tmp_path / name.split("-")[0])
        getattr(syn, maker)(root, seed=0)
        miou = hbird_evaluation(
            model=None,
            d_model=3,
            patch_size=PATCH,
            dataset_name=name,
            data_dir=root,
            batch_size=2,
            input_size=INPUT,
            n_neighbours=3,
            nn_method="exact",
            ftr_extr_fn=oracle_fn,
            num_workers=0,
        )
        assert 0.0 <= float(miou) <= 1.0

    def test_find_nearest_key_to_query_api(self, voc_color):
        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.transforms import get_hbird_val_transforms

        va = get_hbird_val_transforms(INPUT)
        fe = FeatureExtractorSimple(None, oracle_fn, eval_spatial_resolution=S, d_model=3)
        ds, _ = get_dataset("voc", voc_color, 4, 0, va, va, None, None)
        ev = HbirdEvaluation(fe, ds.train_dataloader(), num_classes=21, n_neighbours=5)
        q = np.random.default_rng(0).normal(size=(2, S * S, 3)).astype(np.float32)
        kf, kl = ev._find_nearest_key_to_query(q)
        assert kf.shape == (2, S * S, 5, 3)
        assert kl.shape == (2, S * S, 5, 21)
        # neighbours are unit-norm bank rows
        np.testing.assert_allclose(
            np.linalg.norm(kf, axis=-1), np.ones(kf.shape[:-1]), rtol=1e-4
        )

    def test_ignore_index_override_rule(self, tmp_path):
        """Caller's ignore_index wins only when != 255; otherwise the
        dataset-local value applies (reference hbird_eval.py:714-715 —
        ade20k's local ignore is 0)."""
        from unittest import mock

        from hbird_tpu.data.synthetic import make_ade20k_fixture
        import hbird_tpu.hbird_eval as engine

        root = str(tmp_path / "ade")
        make_ade20k_fixture(root, seed=1)
        seen = {}
        orig = engine.HbirdEvaluation.evaluate

        def spy(self, val_loader, eval_spatial_resolution, return_knn_details=False,
                ignore_index=255):
            seen["ignore"] = ignore_index
            return orig(self, val_loader, eval_spatial_resolution,
                        return_knn_details, ignore_index)

        with mock.patch.object(engine.HbirdEvaluation, "evaluate", spy):
            hbird_evaluation(
                model=None, d_model=3, patch_size=PATCH, dataset_name="ade20k",
                data_dir=root, batch_size=2, input_size=INPUT, n_neighbours=3,
                nn_method="exact", ftr_extr_fn=oracle_fn, num_workers=0,
            )
            assert seen["ignore"] == 0  # default 255 -> dataset-local wins
            hbird_evaluation(
                model=None, d_model=3, patch_size=PATCH, dataset_name="ade20k",
                data_dir=root, batch_size=2, input_size=INPUT, n_neighbours=3,
                nn_method="exact", ftr_extr_fn=oracle_fn, num_workers=0,
                ignore_index=7,
            )
            assert seen["ignore"] == 7  # explicit non-255 override wins

    def test_memory_size_exceeding_patch_count_clamps(self, voc_color):
        # budget > patches/image must clamp (reference's topk would error)
        # and produce a trimmed bank of n_train * patches rows.
        miou = hbird_evaluation(
            model=None, d_model=3, patch_size=PATCH, dataset_name="voc",
            data_dir=voc_color, batch_size=4, input_size=INPUT,
            n_neighbours=5, nn_method="exact", ftr_extr_fn=oracle_fn,
            memory_size=12 * (S * S) * 10,  # 10x more than exists
            num_workers=0,
        )
        assert 0.0 <= float(miou) <= 1.0


class TestSizedUnboundedAccumulation:
    def test_known_size_matches_chunked_path(self):
        """Unbounded + dataset_size uses preallocated donated writes; the
        bank must equal the unknown-size (concat) path exactly."""
        import numpy as np

        rng = np.random.default_rng(0)
        fe = FeatureExtractorSimple(None, oracle_fn, eval_spatial_resolution=8,
                                    d_model=3)
        imgs = rng.normal(size=(6, 3, 32, 32)).astype(np.float32)
        ids = (rng.integers(0, 5, (6, 1, 32, 32)) / 255.0).astype(np.float32)
        loader = [(imgs[:4], ids[:4]), (imgs[4:], ids[4:])]  # ragged tail

        ev_sized = HbirdEvaluation(
            fe, loader, num_classes=21, n_neighbours=3, dataset_size=6,
            augmentation_epoch=1,
        )
        ev_chunked = HbirdEvaluation(
            fe, loader, num_classes=21, n_neighbours=3,
        )
        assert ev_sized.feature_memory.shape == (6 * 64, 3)
        np.testing.assert_array_equal(
            np.asarray(ev_sized.feature_memory),
            np.asarray(ev_chunked.feature_memory),
        )
        np.testing.assert_array_equal(
            np.asarray(ev_sized.label_memory),
            np.asarray(ev_chunked.label_memory),
        )

    def test_loader_shorter_than_dataset_size(self):
        import numpy as np

        rng = np.random.default_rng(1)
        fe = FeatureExtractorSimple(None, oracle_fn, eval_spatial_resolution=8,
                                    d_model=3)
        imgs = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        ids = (rng.integers(0, 5, (2, 1, 32, 32)) / 255.0).astype(np.float32)
        ev = HbirdEvaluation(
            fe, [(imgs, ids)], num_classes=21, n_neighbours=3, dataset_size=5,
        )
        # Trimmed to the rows actually produced.
        assert ev.feature_memory.shape == (2 * 64, 3)
