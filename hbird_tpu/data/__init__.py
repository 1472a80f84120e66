from hbird_tpu.data.registry import get_dataset

__all__ = ["get_dataset"]
