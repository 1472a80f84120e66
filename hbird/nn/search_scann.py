"""Compat: the reference's ScaNN backend name -> the TPU approx backend."""

from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox as NearestNeighborSearchScaNN

from hbird_tpu.nn.search_base import NearestNeighborSearchBase

__all__ = ["NearestNeighborSearchScaNN", "NearestNeighborSearchBase"]
