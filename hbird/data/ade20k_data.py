"""Compat re-export (folder and tar layouts are unified in hbird_tpu)."""

from hbird_tpu.data.ade20k import Ade20kDataModule, ADE20K
