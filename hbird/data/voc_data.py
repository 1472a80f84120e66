"""Compat re-export (folder and tar layouts are unified in hbird_tpu)."""

from hbird_tpu.data.voc import VOCDataModule, VOCDataset, TrainXVOCValDataModule
