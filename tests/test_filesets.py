"""Shipped file_sets/ + verbatim compatibility with the reference's lists."""

import os

import pytest

from hbird_tpu.utils.io import read_file_set

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FS = os.path.join(REPO, "file_sets")
REF_FS = "/root/reference/file_sets"

DIVISORS = (8, 64, 128)
SEEDS = (42, 400, 783, 1293, 4019)


class TestShippedFilesets:
    def test_layout_complete(self):
        for ds, name in (("voc", "trainaug"), ("ade20k", "training")):
            assert os.path.isfile(os.path.join(FS, ds, "full", f"{name}.txt"))
            for d in DIVISORS:
                for s in SEEDS:
                    p = os.path.join(FS, ds, f"1_div_{d}", f"{name}_{d}_{s}.txt")
                    assert os.path.isfile(p), p
        assert os.path.isfile(os.path.join(FS, "voc", "val.txt"))

    def test_subsets_are_deterministic_samples_of_full(self):
        full = set(read_file_set(os.path.join(FS, "voc", "full", "trainaug.txt")))
        assert len(full) == 10582
        for d in DIVISORS:
            for s in SEEDS:
                ids = read_file_set(
                    os.path.join(FS, "voc", f"1_div_{d}", f"trainaug_{d}_{s}.txt")
                )
                assert len(ids) == 10582 // d
                assert set(ids) <= full
                assert ids == sorted(ids)
                assert all(ids), "empty id lines"

    def test_seeds_differ(self):
        a = read_file_set(os.path.join(FS, "voc", "1_div_128", "trainaug_128_42.txt"))
        b = read_file_set(os.path.join(FS, "voc", "1_div_128", "trainaug_128_400.txt"))
        assert a != b

    def test_val_list_matches_canonical_voc(self):
        ids = read_file_set(os.path.join(FS, "voc", "val.txt"))
        assert len(ids) == 1449


@pytest.mark.skipif(
    not os.path.isdir(REF_FS), reason="reference checkout not mounted"
)
class TestReferenceListsVerbatim:
    """The reference's own published lists must load through our reader
    and through the dataset --train-fs path unchanged (published-id parity
    requires using those lists; see file_sets/README.md)."""

    def test_reader_accepts_reference_lists(self):
        for rel in (
            "voc/full/trainaug.txt",
            "voc/1_div_128/trainaug_128_42.txt",
            "ade20k/1_div_8/training_8_42.txt",
        ):
            ids = read_file_set(os.path.join(REF_FS, rel))
            assert ids and all(ids)

    def test_dataset_consumes_reference_list(self, tmp_path):
        """Build a VOC-layout fixture whose ids come from the reference's
        published 1/128 seed-42 list and load it with --train-fs pointing
        at the reference file directly."""
        import numpy as np
        from PIL import Image

        from hbird_tpu.data import get_dataset
        from hbird_tpu.data.transforms import get_hbird_val_transforms

        ref_list = os.path.join(REF_FS, "voc", "1_div_128", "trainaug_128_42.txt")
        ids = read_file_set(ref_list)  # all 80 published ids
        root = tmp_path / "voc"
        for sub in ("images", "SegmentationClassAug", "SegmentationClass"):
            os.makedirs(root / sub, exist_ok=True)
        rng = np.random.default_rng(0)
        for i in ids:
            Image.fromarray(
                rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
            ).save(root / "images" / f"{i}.jpg")
            Image.fromarray(
                rng.integers(0, 21, (24, 32), dtype=np.uint8)
            ).save(root / "SegmentationClassAug" / f"{i}.png")
            Image.fromarray(
                rng.integers(0, 21, (24, 32), dtype=np.uint8)
            ).save(root / "SegmentationClass" / f"{i}.png")

        # Write a tiny val list of the same ids (val masks above).
        val_fs = tmp_path / "val.txt"
        val_fs.write_text("\n".join(ids) + "\n")

        va = get_hbird_val_transforms(16)
        ds, _ = get_dataset(
            "voc", str(root), 2, 0, va, va, ref_list, str(val_fs)
        )
        assert ds.get_train_dataset_size() == len(ids)
        batches = list(ds.train_dataloader())
        assert sum(b[0].shape[0] for b in batches) == len(ids)
