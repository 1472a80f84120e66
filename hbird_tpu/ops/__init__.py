from hbird_tpu.ops.knn import exact_knn, approx_knn, knn_search

__all__ = ["exact_knn", "approx_knn", "knn_search"]
