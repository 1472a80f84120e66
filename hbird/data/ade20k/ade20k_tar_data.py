"""Compat re-export matching the reference module path (folder and tar layouts are unified in hbird_tpu — the *_tar_data module names resolve to the same classes)."""

from hbird_tpu.data.ade20k import Ade20kDataModule, ADE20K

from hbird_tpu.data.backend import stem as stem_from_path  # noqa: E402,F401
