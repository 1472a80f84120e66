from hbird_tpu.utils.io import list_files, read_file_set

__all__ = ["list_files", "read_file_set"]
