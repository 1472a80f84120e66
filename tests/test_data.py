"""Data layer tests: transforms parity vs torch/torchvision semantics,
dataset loaders over synthetic fixtures (folder + tar), registry DSL."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from hbird_tpu.data import get_dataset
from hbird_tpu.data.loader import HostDataLoader
from hbird_tpu.data.synthetic import (
    folder_to_tar,
    make_ade20k_fixture,
    make_cityscapes_fixture,
    make_coco_fixture,
    make_voc_fixture,
)
from hbird_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    get_hbird_train_transforms,
    get_hbird_val_transforms,
    mask_to_tensor,
    nearest_resize,
    normalize,
    random_resized_crop_params,
    to_tensor,
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------


class TestTransformPrimitives:
    def test_to_tensor_semantics(self):
        # ToTensor semantics: uint8 HWC -> float32 CHW / 255.
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
        ours = to_tensor(Image.fromarray(arr))
        ref = (arr.astype(np.float32) / 255.0).transpose(2, 0, 1)
        np.testing.assert_allclose(ours, ref, atol=0)

    def test_normalize_semantics(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(size=(3, 8, 8)).astype(np.float32)
        ours = normalize(x, IMAGENET_MEAN, IMAGENET_STD)
        mean = torch.tensor(IMAGENET_MEAN).view(3, 1, 1)
        std = torch.tensor(IMAGENET_STD).view(3, 1, 1)
        ref = ((torch.from_numpy(x) - mean) / std).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)

    def test_nearest_resize_matches_torch_tensor_nearest(self):
        rng = np.random.default_rng(2)
        m = rng.integers(0, 21, size=(1, 37, 53)).astype(np.float32)
        for size in [(64, 64), (17, 29), (37, 53)]:
            ours = nearest_resize(m, size)
            ref = torch.nn.functional.interpolate(
                torch.from_numpy(m)[None], size=size, mode="nearest"
            )[0].numpy()
            np.testing.assert_allclose(ours, ref, atol=0)

    def test_pil_resize_matches_torch_antialias(self):
        # PIL's bilinear downsample is antialiased; torch's tensor-path
        # antialias=True reproduces it to within uint8 rounding.
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, size=(48, 72, 3), dtype=np.uint8)
        img = Image.fromarray(arr)
        from hbird_tpu.data.transforms import pil_resize_bilinear

        ours = np.asarray(pil_resize_bilinear(img, (32, 32))).astype(np.float32)
        t = torch.from_numpy(arr.astype(np.float32).transpose(2, 0, 1))[None]
        ref = torch.nn.functional.interpolate(
            t, size=(32, 32), mode="bilinear", antialias=True
        )[0].numpy().transpose(1, 2, 0)
        assert np.abs(ours - ref).max() <= 1.0

    def test_rrc_params_within_bounds(self):
        random.seed(0)
        for _ in range(50):
            i, j, h, w = random_resized_crop_params((48, 72), (0.5, 2.0), (0.75, 4 / 3))
            assert 0 <= i <= 48 - h and 0 <= j <= 72 - w
            assert h > 0 and w > 0

    def test_mask_roundtrip_exact(self):
        ids = np.arange(256, dtype=np.uint8).reshape(16, 16)
        m = mask_to_tensor(Image.fromarray(ids, "L"))
        back = (m * 255).astype(np.int64)[0]
        np.testing.assert_array_equal(back, ids)


class TestTransformPipelines:
    def test_val_pipeline_shapes_and_determinism(self):
        rng = np.random.default_rng(4)
        img = Image.fromarray(rng.integers(0, 256, (48, 72, 3), dtype=np.uint8))
        mask = Image.fromarray(rng.integers(0, 21, (48, 72), dtype=np.uint8), "L")
        pipe = get_hbird_val_transforms(32)["pipeline"]
        i1, m1 = pipe(img, mask)
        i2, m2 = pipe(img, mask)
        assert i1.shape == (3, 32, 32) and m1.shape == (1, 32, 32)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(m1, m2)
        # mask ids survive the float convention
        assert set(np.unique((m1 * 255).astype(int))) <= set(range(21))

    def test_train_pipeline_geometry_consistency(self):
        # Image and mask must receive the SAME crop: encode position info in
        # the mask, verify a distinctive structure survives jointly.
        random.seed(123)
        w, h = 96, 64
        img_arr = np.zeros((h, w, 3), np.uint8)
        img_arr[:, : w // 2] = 255  # left half white
        mask_arr = np.zeros((h, w), np.uint8)
        mask_arr[:, : w // 2] = 1  # left half class 1
        pipe = get_hbird_train_transforms(32)["pipeline"]
        img_t, mask_t = pipe(Image.fromarray(img_arr), Image.fromarray(mask_arr, "L"))
        # Wherever the mask says class 1, the (normalized) image should be
        # bright; where class 0, dark. Color jitter preserves this ordering
        # almost everywhere except the crop boundary column.
        ids = (mask_t[0] * 255).astype(int)
        bright = img_t.mean(0)
        if (ids == 1).any() and (ids == 0).any():
            assert bright[ids == 1].mean() > bright[ids == 0].mean()

    def test_train_pipeline_is_random(self):
        random.seed(0)
        rng = np.random.default_rng(5)
        img = Image.fromarray(rng.integers(0, 256, (48, 72, 3), dtype=np.uint8))
        mask = Image.fromarray(rng.integers(0, 21, (48, 72), dtype=np.uint8), "L")
        pipe = get_hbird_train_transforms(32)["pipeline"]
        outs = [pipe(img, mask)[0] for _ in range(4)]
        assert any(not np.array_equal(outs[0], o) for o in outs[1:])


# ---------------------------------------------------------------------------
# Datasets / loaders / registry
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    base = tmp_path_factory.mktemp("data")
    roots = {}
    roots["voc"] = str(base / "voc")
    make_voc_fixture(roots["voc"])
    roots["ade20k"] = str(base / "ade20k")
    make_ade20k_fixture(roots["ade20k"])
    roots["cityscapes"] = str(base / "cityscapes")
    make_cityscapes_fixture(roots["cityscapes"])
    roots["coco"] = str(base / "coco")
    make_coco_fixture(roots["coco"])
    # Tar variants
    roots["voc_tar"] = str(base / "voc.tar")
    folder_to_tar(roots["voc"], roots["voc_tar"], "VOCSegmentation")
    roots["ade20k_tar"] = str(base / "ade20k.tar")
    folder_to_tar(roots["ade20k"], roots["ade20k_tar"], "ade20k")
    roots["cityscapes_tar"] = str(base / "cityscapes.tar")
    folder_to_tar(roots["cityscapes"], roots["cityscapes_tar"], "cityscapes")
    roots["coco_tar"] = str(base / "coco.tar")
    folder_to_tar(roots["coco"], roots["coco_tar"], "coco")
    return roots


def _check_module(dm, ignore_index, num_classes, input_size=32):
    assert dm.get_num_classes() == num_classes
    assert dm.get_train_dataset_size() > 0
    tl = dm.train_dataloader()
    vl = dm.val_dataloader()
    xb, yb = next(iter(tl))
    assert xb.shape[1:] == (3, input_size, input_size)
    assert yb.shape[1:] == (1, input_size, input_size)
    ids = np.unique((yb * 255).round().astype(int))
    assert ids.min() >= 0
    assert all((i < num_classes) or (i == ignore_index) for i in ids), ids
    xb, yb = next(iter(vl))
    assert xb.shape[1:] == (3, input_size, input_size)


@pytest.mark.parametrize("mode", ["folder", "tar"])
class TestRegistry:
    def _roots(self, fixtures, mode, name):
        return fixtures[name if mode == "folder" else f"{name}_tar"]

    def test_voc(self, fixtures, mode):
        tr = get_hbird_train_transforms(32)
        va = get_hbird_val_transforms(32)
        dm, ign = get_dataset(
            "voc", self._roots(fixtures, mode, "voc"), 4, 2, tr, va, None, None
        )
        assert ign == 255
        _check_module(dm, 255, 21)

    def test_ade20k(self, fixtures, mode):
        tr = get_hbird_train_transforms(32)
        va = get_hbird_val_transforms(32)
        dm, ign = get_dataset(
            "ade20k", self._roots(fixtures, mode, "ade20k"), 4, 2, tr, va, None, None
        )
        assert ign == 0
        _check_module(dm, 0, 151)

    def test_cityscapes(self, fixtures, mode):
        tr = get_hbird_train_transforms(32)
        va = get_hbird_val_transforms(32)
        dm, ign = get_dataset(
            "cityscapes",
            self._roots(fixtures, mode, "cityscapes"),
            4,
            2,
            tr,
            va,
            None,
            None,
        )
        assert ign == 255
        _check_module(dm, 255, 19)

    @pytest.mark.parametrize("mask_type,nc", [("stuff", 15), ("thing", 12)])
    def test_coco(self, fixtures, mode, mask_type, nc):
        tr = get_hbird_train_transforms(32)
        va = get_hbird_val_transforms(32)
        dm, ign = get_dataset(
            f"coco-{mask_type}",
            self._roots(fixtures, mode, "coco"),
            4,
            2,
            tr,
            va,
            None,
            None,
        )
        assert ign == 255
        _check_module(dm, 255, nc)


class TestRegistryDSL:
    def test_fractional_sampling(self, fixtures):
        random.seed(0)
        tr = get_hbird_train_transforms(32)
        va = get_hbird_val_transforms(32)
        dm, _ = get_dataset("voc*0.5", fixtures["voc"], 4, 0, tr, va, None, None)
        assert dm.get_train_dataset_size() == 4  # 8 * 0.5

    def test_explicit_filesets(self, fixtures):
        fs = os.path.join(fixtures["voc"], "sets", "trainaug.txt")
        with open(fs) as f:
            ids = [l.strip() for l in f][:3]
        sub = os.path.join(fixtures["voc"], "sets", "sub.txt")
        with open(sub, "w") as f:
            f.write("\n".join(ids))
        tr = get_hbird_train_transforms(32)
        va = get_hbird_val_transforms(32)
        dm, _ = get_dataset("voc", fixtures["voc"], 4, 0, tr, va, sub, None)
        assert dm.get_train_dataset_size() == 3

    def test_unknown_dataset(self, fixtures):
        with pytest.raises(ValueError):
            get_dataset("nope", fixtures["voc"], 4, 0, None, None, None, None)


class TestLoader:
    def test_order_deterministic_and_parallel_equal(self, fixtures):
        from hbird_tpu.data.voc import VOCDataset

        va = get_hbird_val_transforms(32)
        ds = VOCDataset(fixtures["voc"], image_set="val", transforms=va)
        seq = list(HostDataLoader(ds, batch_size=3, num_workers=0))
        par = list(HostDataLoader(ds, batch_size=3, num_workers=4))
        assert len(seq) == len(par) == 2  # 4 val imgs, ragged last batch
        for (x1, y1), (x2, y2) in zip(seq, par):
            np.testing.assert_array_equal(x1, x2)
            np.testing.assert_array_equal(y1, y2)
        assert seq[-1][0].shape[0] == 1  # drop_last=False keeps ragged batch

    def test_drop_last(self, fixtures):
        from hbird_tpu.data.voc import VOCDataset

        va = get_hbird_val_transforms(32)
        ds = VOCDataset(fixtures["voc"], image_set="val", transforms=va)
        batches = list(HostDataLoader(ds, batch_size=3, num_workers=0, drop_last=True))
        assert len(batches) == 1

    def test_tar_parallel_decoding(self, fixtures):
        # Threaded tar access must be safe (per-thread handles).
        from hbird_tpu.data.voc import VOCDataset

        va = get_hbird_val_transforms(32)
        ds = VOCDataset(fixtures["voc_tar"], image_set="trainaug", transforms=va)
        batches = list(HostDataLoader(ds, batch_size=2, num_workers=8))
        assert sum(b[0].shape[0] for b in batches) == 8


class TestProcessLoader:
    """Process-mode workers (forkserver): correctness + determinism. The
    single-core dev host can't show the throughput win — that's for real
    multi-core TPU VMs — but data equality and seeding must hold."""

    def test_process_equals_thread_val(self, fixtures):
        from hbird_tpu.data.voc import VOCDataset

        va = get_hbird_val_transforms(32)
        ds = VOCDataset(fixtures["voc"], image_set="val", transforms=va)
        thread = list(HostDataLoader(ds, batch_size=3, num_workers=2))
        proc_loader = HostDataLoader(ds, batch_size=3, num_workers=2, mode="process")
        proc = list(proc_loader)
        assert len(thread) == len(proc)
        for (x1, y1), (x2, y2) in zip(thread, proc):
            np.testing.assert_array_equal(x1, x2)
            np.testing.assert_array_equal(y1, y2)
        proc_loader.close()

    def test_process_train_deterministic_given_seed(self, fixtures):
        from hbird_tpu.data.voc import VOCDataset

        tr = get_hbird_train_transforms(32)
        ds = VOCDataset(fixtures["voc"], image_set="trainaug", transforms=tr)
        loader = HostDataLoader(ds, batch_size=4, num_workers=2, mode="process")
        random.seed(42)
        run1 = [x.copy() for x, y in loader]
        random.seed(42)
        run2 = [x.copy() for x, y in loader]
        for a, b in zip(run1, run2):
            np.testing.assert_array_equal(a, b)
        # and a different seed changes the augmentations
        random.seed(43)
        run3 = [x.copy() for x, y in loader]
        assert any(not np.array_equal(a, b) for a, b in zip(run1, run3))
        loader.close()

    def test_process_tar_backend_pickles(self, fixtures):
        from hbird_tpu.data.voc import VOCDataset

        va = get_hbird_val_transforms(32)
        ds = VOCDataset(fixtures["voc_tar"], image_set="trainaug", transforms=va)
        loader = HostDataLoader(ds, batch_size=4, num_workers=2, mode="process")
        total = sum(x.shape[0] for x, y in loader)
        assert total == 8
        loader.close()
