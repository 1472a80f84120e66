from hbird_tpu.nn.search_base import NearestNeighborSearchBase
from hbird_tpu.nn.search_exact import NearestNeighborSearchExact
from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox

__all__ = [
    "NearestNeighborSearchBase",
    "NearestNeighborSearchExact",
    "NearestNeighborSearchApprox",
]
