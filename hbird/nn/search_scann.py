"""Compat: the reference's ScaNN backend name -> the TPU approx backend."""

from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox as NearestNeighborSearchScaNN

__all__ = ["NearestNeighborSearchScaNN"]
