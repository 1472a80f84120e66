from hbird_tpu.nn.search_base import NearestNeighborSearchBase

__all__ = ["NearestNeighborSearchBase"]
