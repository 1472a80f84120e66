"""Compat re-export: reference `hbird.data` surface.

The reference's data/__init__ imports the datamodules and io helpers at
module level (reference data/__init__.py:1-37); keep those names
resolvable from `hbird.data` too.
"""

from hbird_tpu.data import get_dataset
from hbird_tpu.data.voc import VOCDataModule
from hbird_tpu.data.ade20k import Ade20kDataModule
from hbird_tpu.data.cityscapes import CityscapesDataModule
from hbird_tpu.data.coco import CocoDataModule
from hbird_tpu.data.transforms import CombTransforms
from hbird_tpu.utils.io import list_files, read_file_set

# Tar-layout module aliases (folder/tar are unified in hbird_tpu).
VOCDataModuleTar = VOCDataModule
Ade20kDataModuleTar = Ade20kDataModule
CityscapesDataModuleTar = CityscapesDataModule
CocoDataModuleTar = CocoDataModule

from hbird.data import voc, ade20k, cityscapes, coco  # noqa: E402,F401

__all__ = [
    "get_dataset",
    "VOCDataModule", "VOCDataModuleTar",
    "Ade20kDataModule", "Ade20kDataModuleTar",
    "CityscapesDataModule", "CityscapesDataModuleTar",
    "CocoDataModule", "CocoDataModuleTar",
    "CombTransforms", "list_files", "read_file_set",
]
