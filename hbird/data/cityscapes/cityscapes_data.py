"""Compat re-export matching the reference module path (folder and tar layouts are unified in hbird_tpu — the *_tar_data module names resolve to the same classes)."""

from hbird_tpu.data.cityscapes import CityscapesDataModule, Cityscapes
