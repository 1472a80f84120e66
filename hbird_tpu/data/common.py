"""Shared dataset plumbing: transform application and the DataModule shape.

DataModules expose the same surface the reference engine consumes
(reference hbird/data/voc/voc_data.py:72-88): train_dataloader /
val_dataloader / get_train_dataset_size / get_val_dataset_size /
get_num_classes.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
from PIL import Image

from hbird_tpu.data.loader import HostDataLoader
from hbird_tpu.data.transforms import mask_to_tensor, to_tensor


def resolve_pipeline(transforms) -> Optional[Callable]:
    """Accept a transform dict ({'pipeline': ...}) or a paired callable."""
    if transforms is None:
        return None
    if isinstance(transforms, dict):
        return transforms.get("pipeline") or transforms.get("shared")
    return transforms


def apply_pair_transform(pipeline, img: Image.Image, mask) -> tuple:
    """Run the paired pipeline; fall back to raw tensors when absent."""
    if pipeline is None:
        return to_tensor(img), mask_to_tensor(mask)
    img_t, mask_t = pipeline(img, mask)
    if isinstance(img_t, Image.Image):
        img_t = to_tensor(img_t)
    if not isinstance(mask_t, np.ndarray):
        mask_t = mask_to_tensor(mask_t)
    # Keep uint8 batches uint8 (device-normalize pipelines): the 4x smaller
    # host->device transfer is the point.
    img_t = np.asarray(img_t)
    mask_t = np.asarray(mask_t)
    if img_t.dtype != np.uint8:
        img_t = img_t.astype(np.float32, copy=False)
    if mask_t.dtype != np.uint8:
        mask_t = mask_t.astype(np.float32, copy=False)
    return img_t, mask_t


class SegDataModule:
    """Generic segmentation datamodule over (train, val) datasets."""

    def __init__(
        self,
        train_dataset,
        val_dataset,
        batch_size: int,
        num_workers: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_classes: int = 0,
        loader_mode: str = "thread",
    ):
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._num_classes = num_classes
        self.loader_mode = loader_mode

    def setup(self, stage: Optional[str] = None):
        return self

    def __len__(self):
        return len(self.train_dataset)

    def train_dataloader(self) -> HostDataLoader:
        return HostDataLoader(
            self.train_dataset,
            batch_size=self.batch_size,
            shuffle=self.shuffle,
            num_workers=self.num_workers,
            drop_last=self.drop_last,
            mode=self.loader_mode,
        )

    def val_dataloader(self) -> HostDataLoader:
        return HostDataLoader(
            self.val_dataset,
            batch_size=self.batch_size,
            shuffle=False,
            num_workers=self.num_workers,
            drop_last=self.drop_last,
            mode=self.loader_mode,
        )

    def get_train_dataset_size(self) -> int:
        return len(self.train_dataset)

    def get_val_dataset_size(self) -> int:
        return len(self.val_dataset)

    def get_num_classes(self) -> int:
        return self._num_classes
