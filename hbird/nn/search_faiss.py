"""Compat: the reference's Faiss backend name -> the TPU exact backend."""

from hbird_tpu.nn.search_exact import NearestNeighborSearchExact as NearestNeighborSearchFaiss

from hbird_tpu.nn.search_base import NearestNeighborSearchBase

__all__ = ["NearestNeighborSearchFaiss", "NearestNeighborSearchBase"]
