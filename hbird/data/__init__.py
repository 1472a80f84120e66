from hbird_tpu.data import get_dataset

__all__ = ["get_dataset"]
