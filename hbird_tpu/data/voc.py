"""Pascal VOC segmentation dataset (folder and tar layouts).

Folder layout (reference hbird/data/voc/voc_data.py:138-161):
    root/images/<id>.jpg
    root/SegmentationClassAug/<id>.png   (train/trainaug)
    root/SegmentationClass/<id>.png      (val)
    root/sets/{trainaug,val}.txt
Tar layout (reference hbird/data/voc/voc_tar_data.py:177-226): the same
under a 'VOCSegmentation/' prefix inside the archive.
"""

from __future__ import annotations

import os
from typing import List, Optional

from hbird_tpu.data.backend import TarBackend, make_backend, pair_by_stem, stem
from hbird_tpu.data.common import SegDataModule, apply_pair_transform, resolve_pipeline

VOC_CLASS_IDX_TO_NAME = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]

_TAR_PREFIX = "VOCSegmentation/"


class VOCDataset:
    def __init__(
        self,
        root: str,
        image_set: str = "trainaug",
        transforms=None,
        file_set: Optional[List[str]] = None,
        return_masks: bool = False,
    ):
        assert image_set in ("trainaug", "train", "val"), image_set
        self.root = root
        self.image_set = image_set
        self.return_masks = return_masks
        self.pipeline = resolve_pipeline(transforms)
        self.backend = make_backend(root)
        seg_folder = (
            "SegmentationClass" if image_set == "val" else "SegmentationClassAug"
        )

        if isinstance(self.backend, TarBackend):
            imgs = [
                m
                for m in self.backend.members
                if m.startswith(_TAR_PREFIX + "images/") and m.lower().endswith(".jpg")
            ]
            masks = [
                m
                for m in self.backend.members
                if m.startswith(_TAR_PREFIX + seg_folder + "/")
                and m.lower().endswith(".png")
            ]
            if file_set is None:
                self.images, self.masks = pair_by_stem(sorted(imgs), sorted(masks))
            else:
                img_map = {stem(p): p for p in imgs}
                mask_map = {stem(p): p for p in masks}
                wanted = sorted(set(file_set))
                self.images = [img_map[s] for s in wanted if s in img_map and s in mask_map]
                self.masks = [mask_map[s] for s in wanted if s in img_map and s in mask_map]
        else:
            image_dir = os.path.join(root, "images")
            seg_dir = os.path.join(root, seg_folder)
            if not (os.path.isdir(image_dir) and os.path.isdir(seg_dir)):
                raise RuntimeError("Dataset not found or corrupted.")
            if file_set is None:
                imgs = [
                    os.path.join(image_dir, f)
                    for f in sorted(os.listdir(image_dir))
                    if f.lower().endswith(".jpg")
                ]
                masks = [
                    os.path.join(seg_dir, f)
                    for f in sorted(os.listdir(seg_dir))
                    if f.lower().endswith(".png")
                ]
                self.images, self.masks = pair_by_stem(imgs, masks)
            else:
                self.images = [os.path.join(image_dir, f"{f}.jpg") for f in sorted(file_set)]
                self.masks = [os.path.join(seg_dir, f"{f}.png") for f in sorted(file_set)]
                missing = [p for p in self.images + self.masks if not os.path.isfile(p)]
                if missing:
                    raise FileNotFoundError(f"Missing dataset files, e.g. {missing[:3]}")

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, index: int):
        img = self.backend.open_image(self.images[index]).convert("RGB")
        mask = self.backend.open_image(self.masks[index])
        return apply_pair_transform(self.pipeline, img, mask)


class VOCDataModule(SegDataModule):
    CLASS_IDX_TO_NAME = VOC_CLASS_IDX_TO_NAME

    def __init__(
        self,
        data_dir: str,
        train_split: str = "trainaug",
        val_split: str = "val",
        train_image_transform=None,
        batch_size: int = 64,
        num_workers: int = 8,
        val_transforms=None,
        shuffle: bool = False,
        return_masks: bool = True,
        drop_last: bool = False,
        train_file_set=None,
        val_file_set=None,
        loader_mode: str = "thread",
        **_,
    ):
        train_ds = VOCDataset(
            data_dir,
            image_set=train_split,
            transforms=train_image_transform,
            file_set=train_file_set,
            return_masks=return_masks,
        )
        val_ds = VOCDataset(
            data_dir,
            image_set=val_split,
            transforms=val_transforms,
            file_set=val_file_set,
        )
        super().__init__(
            train_ds,
            val_ds,
            batch_size=batch_size,
            num_workers=num_workers,
            shuffle=shuffle,
            drop_last=drop_last,
            loader_mode=loader_mode,
            num_classes=len(self.CLASS_IDX_TO_NAME),
        )

    def class_id_to_name(self, i: int) -> str:
        return self.CLASS_IDX_TO_NAME[i]


class TrainXVOCValDataModule:
    """Train on dataset X, validate on VOC (reference voc_data.py:91-113)."""

    def __init__(self, train_datamodule, val_datamodule: VOCDataModule):
        self.train_datamodule = train_datamodule
        self.val_datamodule = val_datamodule

    def setup(self, stage=None):
        self.train_datamodule.setup(stage)
        self.val_datamodule.setup(stage)

    def class_id_to_name(self, i: int):
        return self.val_datamodule.class_id_to_name(i)

    def __len__(self):
        return len(self.train_datamodule)

    def train_dataloader(self):
        return self.train_datamodule.train_dataloader()

    def val_dataloader(self):
        return self.val_datamodule.val_dataloader()

    def get_train_dataset_size(self):
        return self.train_datamodule.get_train_dataset_size()

    def get_val_dataset_size(self):
        return self.val_datamodule.get_val_dataset_size()

    def get_num_classes(self):
        return self.val_datamodule.get_num_classes()
